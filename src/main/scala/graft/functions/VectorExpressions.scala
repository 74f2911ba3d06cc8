package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two equal-length float/double
  * arrays — the custom-Expression tier of the preference order (a
  * Catalyst Expression with doGenCode beats composed HOFs beats UDFs):
  * `zip_with + aggregate` materializes an intermediate product array
  * per row; this expression is a single fused loop.
  *
  * Semantics are BIT-IDENTICAL to
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0d, (acc, x) => acc + x)`:
  * elements widen to double before multiply, accumulation is a
  * sequential left fold, any null element or a length mismatch yields
  * null — so DuckDB oracles built on list_sum keep hash-matching.
  */
case class DoubleDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val at = elemType(left)
    val bt = elemType(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = at match {
        case FloatType => a.getFloat(i).toDouble
        case _ => a.getDouble(i)
      }
      val y = bt match {
        case FloatType => b.getFloat(i).toDouble
        case _ => b.getDouble(i)
      }
      sum += x * y
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String = elemType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += (${getter(left, a, i)}) * (${getter(right, b, i)});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

object VectorExpressions {
  /** Register `graft_dot(a, b)` in the session (idempotent: a no-op if
    * already present, so repeated calls don't spam replace-function
    * warnings). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")
    if (!registry.functionExists(ident)) {
      registry.createOrReplaceTempFunction(
        "graft_dot",
        exprs => { require(exprs.length == 2, "graft_dot(a, b)"); DoubleDot(exprs.head, exprs(1)) },
        "built-in")
    }
  }
}
