package graft.sinks

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real JDBC transport for the warehouse sink (K1) and the dimension
  * snapshot source (S3), exercised end-to-end against embedded Apache
  * Derby (shipped in /opt/spark/jars — no network, no server process).
  *
  * The reference's sink is a hand-rolled PreparedStatement batcher into
  * ClickHouse (EnhancedEngagementStreamingJob.java:449–599) and its
  * generator seeds dimensions from a JDBC scan (data-generator/
  * generator.py:53–56). Spark's built-in JDBC relation covers both:
  * `df.write.jdbc` batches inserts per partition (option "batchsize" =
  * the reference's batch of 500), `spark.read.jdbc` with
  * partitionColumn/lowerBound/upperBound/numPartitions issues one
  * range-predicated query per partition so a big dimension scan is
  * parallel across executors instead of a single-connection funnel —
  * the posture a 1000-executor cluster needs (each task opens its own
  * connection to a replica/shard; no driver-side materialization).
  *
  * Derby specifics kept out of the hot path:
  *  - in-memory databases (`jdbc:derby:memory:<name>`) live for the
  *    JVM; tests and the registered round-trip query use unique names
  *    and hold only tiny aggregate tables (bounded leak, documented at
  *    the call sites);
  *  - Spark's DerbyDialect maps StringType to CLOB, which Derby cannot
  *    GROUP BY or compare — callers pass `createTableColumnTypes` to
  *    force VARCHAR for key columns (same knob a ClickHouse/Postgres
  *    deployment uses for engine-specific DDL).
  */
object Jdbc {

  /** Embedded Derby in-memory URL (created on first connect). */
  def derbyMemUrl(name: String): String = s"jdbc:derby:memory:$name;create=true"

  /** Connection properties; the explicit driver class makes executor
    * tasks load Derby without relying on DriverManager autodiscovery
    * order inside the Spark classloader. */
  def derbyProps(): Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  /** K1 batch write: per-partition batched INSERTs inside one
    * transaction per task (Spark's JdbcUtils.savePartition), retries
    * governed by spark.task.maxFailures — the reference's manual
    * rollback+retry loop, but distributed. */
  def writeTable(df: DataFrame, url: String, table: String,
      columnTypes: Option[String] = None, batchSize: Int = 500,
      props: Properties = derbyProps()): Unit = {
    val w = df.write.mode("overwrite").option("batchsize", batchSize)
    columnTypes.fold(w)(ct => w.option("createTableColumnTypes", ct))
      .jdbc(url, table, props)
  }

  /** S3 single-partition read (small dims: fine to pull over one
    * connection, then broadcast for the enrichment join). */
  def readTable(spark: SparkSession, url: String, table: String,
      props: Properties = derbyProps()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S3 partitioned read: `numPartitions` concurrent range-predicated
    * scans over `partCol` — the scale path for a dimension too big to
    * single-connection. Stride boundaries are Spark-computed; rows
    * outside [lower, upper) still land in the edge partitions (no loss). */
  def readTablePartitioned(spark: SparkSession, url: String, table: String,
      partCol: String, lower: Long, upper: Long, numPartitions: Int,
      props: Properties = derbyProps()): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numPartitions, props)

  /** foreachBatch body writing each micro-batch to the warehouse table
    * (append; idempotence comes from the LWW key dedup on read, same
    * contract as sinks.Warehouse). */
  def streamWriter(url: String, table: String,
      columnTypes: Option[String] = None, batchSize: Int = 500,
      props: Properties = derbyProps()): (DataFrame, Long) => Unit =
    (df, _) => {
      val w = df.write.mode("append").option("batchsize", batchSize)
      columnTypes.fold(w)(ct => w.option("createTableColumnTypes", ct))
        .jdbc(url, table, props)
    }

  /** Drop an in-memory Derby database (frees the JVM-held pages).
    * Derby signals a successful drop with SQLState 08006. */
  def dropDerbyMem(name: String): Unit =
    try java.sql.DriverManager.getConnection(s"jdbc:derby:memory:$name;drop=true")
    catch { case e: java.sql.SQLException if e.getSQLState == "08006" => () }
}
