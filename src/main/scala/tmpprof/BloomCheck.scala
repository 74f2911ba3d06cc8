import org.apache.spark.sql.SparkSession
object BloomCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("x").createOrReplaceTempView("t")
    try {
      val bf = spark.sql("SELECT bloom_filter_agg(xxhash64(x), 100, 800) AS bf FROM t")
      bf.createOrReplaceTempView("b")
      val hit = spark.sql("SELECT might_contain((SELECT bf FROM b), xxhash64(CAST(2 AS BIGINT))) AS h").head.getBoolean(0)
      println(s"BLOOM_OK hit=$hit")
    } catch { case e: Exception => println(s"BLOOM_FAIL ${e.getMessage.take(200)}") }
    spark.stop()
  }
}
