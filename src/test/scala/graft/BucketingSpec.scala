package graft

import org.apache.spark.sql.functions._

/** The co-located-join layout lever: bucketed+sorted tables join with
  * neither Exchange nor Sort in the plan. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs without exchange or sort") {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      // the join itself must consume bucket layout: no shuffle, no sort
      // below the join (the only exchange allowed is the one for the
      // final groupBy on a different key)
      val joinSection = plan.split("SortMergeJoin")(1)
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
        "lineitem side must not re-shuffle")
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        "orders side must not re-shuffle")
      // and results are right
      assert(joined.collect().map(_.getLong(1)).sum === 6000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    }
  }
}
