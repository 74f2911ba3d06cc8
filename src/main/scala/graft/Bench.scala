package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Queries

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"value":…,"queries":{…},"sf":…}.
  *
  * Each query is forced end-to-end with a noop-format write (computes
  * every column, unlike count() which lets Catalyst prune the plan). A
  * warmup pass on the first query absorbs JVM/codegen startup so the
  * numbers reflect steady-state execution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Double = {
      val t0 = System.nanoTime()
      try Queries.runners(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // optional args (local probing only — the driver passes none):
    // explicit query names to time instead of the headline set
    val names = if (args.nonEmpty) args.toSeq else Queries.headlines.map(_.name)
    names.foreach(force) // warm codegen/JIT for every plan once
    // best-of-3 timed runs: the local VM is noisy and min-of-n is the
    // standard way to read steady-state latency through that noise
    val results = names.map { n =>
      val t = Seq(force(n), force(n), force(n)).filter(_ >= 0)
      n -> (if (t.isEmpty) -1.0 else t.min)
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
