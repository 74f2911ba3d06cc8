package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Throwaway scale probe (not part of the driver contract). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $n: ${(System.nanoTime() - t0) / 1e9}%.1f s ($r rows)")
    }
    // 100k synthetic docs, ~60 tokens each, 10% near-dup pairs
    val vocab = (0 until 500).map(i => s"w$i")
    val docs = spark.range(100000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 60).map(j =>
        element_at(typedLit(vocab), (pmod(hash(col("id") - pmod(col("id"), lit(10)) / 9 * 0, lit(7919) * (j + 1)), lit(500)) + 1).cast("int"))): _*).as("text"))
      .cache()
    docs.count()
    time("minhash signatures md5") {
      graft.dedup.MinHash.signatures(docs, col("doc_id"), col("text"))
        .write.format("noop").mode("overwrite").save(); 100000L
    }
    time("minhash signatures xx") {
      graft.dedup.MinHash.signatures(docs, col("doc_id"), col("text"),
        graft.dedup.MinHash.Config(hashFamily = "xx"))
        .write.format("noop").mode("overwrite").save(); 100000L
    }
    time("minhash full verified pairs") {
      graft.dedup.MinHash.verifiedPairs(docs, col("doc_id"), col("text")).count()
    }
    time("simhash fingerprints") {
      graft.dedup.SimHash.fingerprints(docs, col("doc_id"), col("text"))
        .write.format("noop").mode("overwrite").save(); 100000L
    }
    time("exact dedup groups") {
      graft.ops.Dedup.exactGroups(docs, col("text"), col("doc_id")).count()
    }
    time("span dedup 100k docs (~800k spans)") {
      graft.ops.Corpus.spanDedup(docs, col("doc_id"), col("text")).count()
    }
    // 10M synthetic events over 100k users for the funnel chain
    val events = spark.range(10000000L).select(
      pmod(col("id"), lit(100000L)).as("user_id"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 7919L).as("ts"),
      element_at(typedLit(Seq("view", "click", "purchase", "other")),
        (pmod(hash(col("id")), lit(4)) + 1).cast("int")).as("event_type"))
    time("windowFunnel 10M events / 100k users") {
      graft.ops.Funnel.windowFunnel(events, col("user_id"), col("ts"),
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"), window = "30 DAYS").count()
    }
    spark.stop()
  }
}
