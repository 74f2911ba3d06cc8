package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.BoundedTopK

/** SparkSessionExtensions entry point: registers the engine's custom
  * functions at session build time, the deployment path for clusters
  * (`--conf spark.sql.extensions=graft.GraftExtensions`). Interactive
  * sessions can equivalently call BoundedTopK.register(spark). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("bounded_top_k"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "bounded_top_k"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "bounded_top_k(score, key, k)")
        val k = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"k must be an int literal, got $other")
        }
        BoundedTopK(exprs.head, exprs(1), k).toAggregateExpression()
      }))
  }
}
