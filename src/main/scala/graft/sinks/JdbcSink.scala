package graft.sinks

import org.apache.spark.sql.DataFrame

/** K1: the warehouse JDBC sink as a foreachBatch body. The reference's
  * hand-rolled sink machinery (EnhancedEngagementStreamingJob.java:
  * 449–599) maps onto Spark built-ins wholesale:
  *
  *  | reference                         | here                          |
  *  |-----------------------------------|-------------------------------|
  *  | PreparedStatement batch of 500    | option("batchsize", 500)      |
  *  | manual commit / rollback+rethrow  | per-task txn in the JDBC writer|
  *  | 10x connect retry w/ backoff      | spark.task.maxFailures        |
  *  | null-safe setters                 | nullable schema handling      |
  *  | micro-batch flush                 | foreachBatch boundary         |
  *
  * No database exists in this environment, so this constructor is
  * code-only; its semantics twin (append + LWW dedup) is the tested
  * parquet Warehouse sink.
  */
object JdbcSink {
  def writer(url: String, table: String, props: java.util.Properties,
      batchSize: Int = 500): (DataFrame, Long) => Unit =
    (df, _) => df.write.mode("append")
      .option("batchsize", batchSize)
      .jdbc(url, table, props)
}
