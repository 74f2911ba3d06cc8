package graft

import org.apache.spark.sql.functions._

/** ProjectionRouting semantics on a synthetic table: the routed read
  * must equal the base full-scan filter bit-for-bit, prune a selective
  * box to a fraction of the files, and DECLINE (plan untouched) when
  * the predicate gives it nothing to prune on. (q_projection_routed
  * oracle-gates the routed result corpus-wide and pins the <= 35%
  * opened-file bound in-query.) */
class ProjectionRoutingSpec extends SparkSpec {

  private lazy val stores = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_projspec")
    tmp.toFile.deleteOnExit()
    val factPath = s"$tmp/fact"
    val projBase = s"$tmp/proj"
    spark.range(0, 50000).select(col("id"),
        pmod(col("id") * 7, lit(1000)).cast("long").as("x"),
        pmod(col("id") * 13, lit(1000)).cast("long").as("y"))
      .write.mode("overwrite").parquet(factPath)
    graft.sinks.ZOrder.commitReplaceZOrdered(spark, projBase,
      spark.read.parquet(factPath), zCols = Seq("x", "y"), numFiles = 32)
    (factPath, projBase)
  }

  private def withRule[A](f: => A): A = {
    val (factPath, projBase) = stores
    val rule = graft.plans.ProjectionRouting(spark, factPath, projBase,
      zCols = Seq("x", "y"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule
    try f finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == rule)
    }
  }

  test("routed box read scans the projection and equals the base filter") {
    val (factPath, projBase) = stores
    val base = spark.read.parquet(factPath)
      .filter(col("x") >= 100L && col("x") <= 150L &&
        col("y") >= 200L && col("y") <= 260L)
      .collect().map(_.toSeq).toSet
    withRule {
      val routed = spark.read.parquet(factPath)
        .filter(col("x") >= 100L && col("x") <= 150L &&
          col("y") >= 200L && col("y") <= 260L)
      val phys = routed.queryExecution.executedPlan.toString()
      assert(phys.contains(projBase) && !phys.contains(factPath),
        s"box filter must route onto the projection:\n${phys.take(1500)}")
      assert(routed.collect().map(_.toSeq).toSet === base)
    }
    // a selective box opens a fraction of the layout's files
    val frac = graft.sinks.ZOrder.filesOpenedFraction(spark, projBase,
      Seq(("x", 100.0, 150.0), ("y", 200.0, 260.0)))
    assert(frac <= 0.35, s"2-D box opened $frac of the files")
  }

  test("declines when no z column is bounded on both sides") {
    val (factPath, projBase) = stores
    withRule {
      // half-open range + non-layout predicate: conservative rule stays
      // on the base table
      val p = spark.read.parquet(factPath)
        .filter(col("x") >= 100L && col("id") < 1000L)
        .queryExecution.executedPlan.toString()
      assert(!p.contains(projBase) && p.contains(factPath),
        s"half-open predicate must not route:\n${p.take(1500)}")
    }
  }

  test("extra non-range conjuncts ride along on the routed scan") {
    val (factPath, projBase) = stores
    def q() = spark.read.parquet(factPath)
      .filter(col("x") >= 100L && col("x") <= 150L &&
        col("y") >= 200L && col("y") <= 260L && pmod(col("id"), lit(2)) === 0)
    val expect = q().collect().map(_.toSeq).toSet // rule NOT installed
    withRule {
      val routed = q()
      val phys = routed.queryExecution.executedPlan.toString()
      assert(phys.contains(projBase), phys.take(1500))
      assert(routed.collect().map(_.toSeq).toSet === expect)
    }
  }
}
