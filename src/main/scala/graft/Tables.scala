package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine code reads through here so the timestamp-encoding quirk is
  * handled in exactly one place: `events.ts` has shipped as parquet
  * TIMESTAMP(NANOS, isAdjustedToUTC=false) — which Spark only reads via
  * `spark.sql.legacy.parquet.nanosAsLong=true` (a LongType of
  * nanoseconds, integer-divided here to micros, the same truncation
  * DuckDB applies) — and as TIMESTAMP(MICROS, isAdjustedToUTC=false),
  * which Spark reads as TIMESTAMP_NTZ (cast here to TimestampType in
  * the UTC session — identical instants either way). Downstream code
  * always sees a plain UTC TimestampType `ts`, whichever encoding the
  * generator used.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // defensively enable the nanos-as-long legacy read: callers (e.g.
    // the driver's own smoke session) may not have set it, and without
    // it Spark refuses TIMESTAMP(NANOS) parquet outright
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    } else df
  }

  /** Register every table as a temp view so the whole engine surface is
    * also reachable through plain `spark.sql` (the DataFrame API and SQL
    * compile to the same plans). */
  def createViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
}
