package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.cdc.{AvroDecodeEngagement, AvroEncodeEngagement}
import graft.functions.{BoundedTopK, DoubleDot, MisraGries}

/** SparkSessionExtensions entry point: registers the engine's custom
  * functions at session build time, the deployment path for clusters
  * (`--conf spark.sql.extensions=graft.GraftExtensions`). Interactive
  * sessions can equivalently call the per-object register(spark)
  * helpers. */
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
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "misra_gries(item, k)")
        val k = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"k must be an int literal, got $other")
        }
        MisraGries(exprs.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("misra_gries_w"),
      new ExpressionInfo(classOf[graft.functions.MisraGriesWeighted].getName, "misra_gries_w"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "misra_gries_w(item, weight, k)")
        val k = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"k must be an int literal, got $other")
        }
        graft.functions.MisraGriesWeighted(exprs.head, exprs(1), k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DoubleDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot(a, b)")
        DoubleDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_avro_encode"),
      new ExpressionInfo(classOf[AvroEncodeEngagement].getName, "graft_avro_encode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_avro_encode(struct)")
        AvroEncodeEngagement(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_avro_decode"),
      new ExpressionInfo(classOf[AvroDecodeEngagement].getName, "graft_avro_decode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_avro_decode(binary)")
        AvroDecodeEngagement(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "graft_bloom_agg(xxhash64_col, est_items, num_bits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2)).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_might_contain(bloom, xxhash64_value)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))
      }))
  }
}
