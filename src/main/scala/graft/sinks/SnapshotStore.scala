package graft.sinks

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, input_file_name, lit, max, min, not, when}

/** Transactional snapshot commits on a plain filesystem — the atomicity
  * the reference gets for free from ClickHouse part-swaps
  * (/root/reference/sql/clickhouse-init.sql:21–23), rebuilt as a
  * minimal manifest-pointer log (no Delta/Iceberg available offline):
  *
  * {{{
  *   <base>/_manifests/m0000000042    manifest: one data-file relative path per line
  *   <base>/data/<partition dirs>/part-*.parquet   immutable data files
  *   <base>/_stage/<uuid>/            transient write staging
  * }}}
  *
  * The LIVE snapshot is the highest-versioned manifest — the same
  * last-log-entry-wins protocol as Delta's transaction log, with no
  * mutable pointer file at all:
  *  - data files and manifests are IMMUTABLE once published — commits
  *    only add files and rename one new manifest into place (a
  *    create-without-overwrite rename: atomic on POSIX/HDFS, and it
  *    FAILS if the version already exists, which surfaces a concurrent
  *    writer instead of silently losing a commit);
  *  - a reader therefore resolves either the previous or the new
  *    manifest — never a missing or half-written table;
  *  - `vacuum` deletes files unreferenced by the newest `keepManifests`
  *    manifests, so an in-flight reader of the previous version stays
  *    valid through the next commit.
  *
  * Single writer assumed ACROSS PROCESSES (a streaming foreachBatch
  * serializes batches; compaction is maintenance run against quiesced
  * or closed partitions) — this is Delta's model minus optimistic
  * concurrency, which one pointer file cannot arbitrate. WITHIN a
  * process, commits to the same base serialize on a per-base JVM
  * lock: the read-current → stage → publish sequence is a
  * read-modify-write, and two interleaved in-process writers would
  * otherwise both extend the SAME parent version — on HDFS the loser's
  * rename fails loudly, but POSIX rename(2) (RawLocalFileSystem)
  * OVERWRITES an existing destination, silently dropping the first
  * commit. The lock closes that hole for the real in-process case
  * (several streaming queries landing in one table from one driver);
  * an exists-check before the rename additionally converts most
  * cross-process races into the loud conflict. At 100 TB the
  * partition-scoped commit is the workhorse: compacting one closed
  * month touches that month's files and a few KB of manifest, never
  * the table.
  *
  * DATA SKIPPING: commits may record per-file min/max statistics for
  * chosen numeric columns as `#stats=` manifest lines (the same idea as
  * Delta's file stats / ClickHouse's sparse index). A range read then
  * prunes whole files from the manifest ALONE — zero data IO for files
  * whose [min,max] misses the query interval. Stats ride the manifest,
  * so they carry forward with their files across appends/compactions
  * and die with them at vacuum. Files without stats are always read
  * (conservative), so skipping is purely an optimization, never a
  * correctness risk.
  */
object SnapshotStore {

  private def conf(spark: SparkSession) = spark.sparkContext.hadoopConfiguration
  private def fs(spark: SparkSession, base: String): FileSystem =
    new Path(base).getFileSystem(conf(spark))

  private def manifestDir(base: String) = new Path(base, "_manifests")
  private def dataDir(base: String) = s"$base/data"

  /** Per-base commit lock (see the class doc's concurrency contract):
    * every commitAppend/commitReplace/commitReplacePartition holds it
    * from manifest resolution through publish, so in-process writers
    * serialize instead of racing the version number. Keyed by the raw
    * base string — callers addressing one table must use one spelling,
    * the same contract the checkpoint/tag paths already assume. */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def commitLock(base: String): Object =
    commitLocks.computeIfAbsent(base, _ => new Object)

  // ---- small file IO ------------------------------------------------------

  private def writeFile(f: FileSystem, p: Path, content: String): Unit = {
    val out = f.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readFile(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      StandardCharsets.UTF_8)
    finally in.close()
  }

  // ---- manifest resolution ------------------------------------------------

  /** Name of the live manifest (highest version), if any commit has
    * happened. */
  def currentManifest(spark: SparkSession, base: String): Option[String] = {
    val f = fs(spark, base)
    if (!f.exists(manifestDir(base))) None
    else f.listStatus(manifestDir(base)).iterator
      .map(_.getPath.getName).filter(_.startsWith("m"))
      .maxByOption(manifestVersion)
  }

  private def manifestVersion(name: String): Long = name.stripPrefix("m").toLong

  private def manifestLines(spark: SparkSession, base: String, name: String): Seq[String] = {
    val content = readFile(fs(spark, base), new Path(manifestDir(base), name))
    content.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def manifestFiles(spark: SparkSession, base: String, name: String): Seq[String] =
    manifestLines(spark, base, name).filterNot(_.startsWith("#"))

  /** Newest-first cap on the tag lines carried from one manifest to the
    * next: the idempotence window covers the last MaxTags tagged
    * commits no matter how many compactions or vacuums run in between
    * (a checkpointed streaming sink only ever replays its most recent
    * batch, so 100 is three orders of magnitude of slack). */
  val MaxTags = 100

  /** True if the LIVE manifest carries `#tag=<tag>` — the idempotence
    * probe for [[commitAppend]]'s tag. O(one manifest read): every
    * commit copies the newest MaxTags tag lines forward, so the live
    * manifest alone holds the whole window and old manifests never
    * need scanning. */
  def hasTag(spark: SparkSession, base: String, tag: String): Boolean =
    currentManifest(spark, base)
      .exists(m => manifestLines(spark, base, m).contains(s"#tag=$tag"))

  /** Relative data-file paths of the live snapshot (empty if none). */
  def listFiles(spark: SparkSession, base: String): Seq[String] =
    currentManifest(spark, base).map(manifestFiles(spark, base, _)).getOrElse(Nil)

  /** All committed manifest versions, ascending. */
  def versions(spark: SparkSession, base: String): Seq[Long] = {
    val f = fs(spark, base)
    if (!f.exists(manifestDir(base))) Nil
    else f.listStatus(manifestDir(base)).iterator
      .map(_.getPath.getName).filter(_.startsWith("m"))
      .map(manifestVersion).toSeq.sorted
  }

  /** Incremental (CDC-style) read of the manifest log: rows in data
    * files that manifest `vTo` lists but `vFrom` does not — for an
    * append-only writer this is exactly the rows committed in
    * (vFrom, vTo]. Compaction rewrites files, so a file-level diff
    * across a compaction over-reports; consumers needing exactness
    * across compactions read through the LWW/FINAL path instead.
    * Scale posture: the diff is
    * a manifest-list set difference (driver-side metadata, two small
    * file reads) — no data is scanned beyond the changed files. Pass
    * vFrom < 0 for "everything up to vTo" (version numbers start at 0). */
  def changesBetween(spark: SparkSession, base: String,
      vFrom: Long, vTo: Long): Option[DataFrame] = {
    val from: Set[String] =
      if (vFrom < 0) Set.empty
      else manifestFiles(spark, base, f"m$vFrom%010d").toSet
    val added = manifestFiles(spark, base, f"m$vTo%010d").filterNot(from)
    if (added.isEmpty) None
    else Some(spark.read.option("basePath", dataDir(base))
      .parquet(added.map(f => s"${dataDir(base)}/$f"): _*))
  }

  /** Time travel: the snapshot as of manifest version `v` (None if that
    * manifest is empty). Manifests are immutable and survive until
    * [[vacuum]] drops them, so any retained version reads with full
    * snapshot isolation — the batch analog of reprocessing from an old
    * offset. Throws FileNotFoundException for a vacuumed/unknown version. */
  def readVersion(spark: SparkSession, base: String, v: Long): Option[DataFrame] = {
    val files = manifestFiles(spark, base, f"m$v%010d")
    if (files.isEmpty) None
    else Some(spark.read.option("basePath", dataDir(base))
      .parquet(files.map(f => s"${dataDir(base)}/$f"): _*))
  }

  /** The live snapshot as a DataFrame (partition columns recovered from
    * the relative paths via basePath), or None when no commit exists or
    * the live manifest is empty. */
  def read(spark: SparkSession, base: String): Option[DataFrame] = {
    val files = listFiles(spark, base)
    if (files.isEmpty) None
    else Some(spark.read.option("basePath", dataDir(base))
      .parquet(files.map(f => s"${dataDir(base)}/$f"): _*))
  }

  // ---- commits ------------------------------------------------------------

  /** Write `df` to staging, move its parquet files under data/
    * (preserving partition subdirs), return their relative paths. The
    * files are invisible to readers until a manifest references them. */
  private def stageWrite(spark: SparkSession, base: String, df: DataFrame,
      partitionBy: Seq[String]): Seq[String] = {
    val f = fs(spark, base)
    val stage = s"$base/_stage/${UUID.randomUUID()}"
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(stage)
    val stagePath = new Path(stage)
    val stageUri = f.makeQualified(stagePath).toUri
    val it = f.listFiles(stagePath, true)
    val rels = Seq.newBuilder[String]
    while (it.hasNext) {
      val status = it.next()
      val p = status.getPath
      if (p.getName.endsWith(".parquet")) {
        val rel = stageUri.relativize(f.makeQualified(p).toUri).getPath
        val dest = new Path(s"${dataDir(base)}/$rel")
        f.mkdirs(dest.getParent)
        if (!f.rename(p, dest))
          throw new java.io.IOException(s"failed to move staged file $p to $dest")
        rels += rel
      }
    }
    f.delete(stagePath, true)
    rels.result()
  }

  /** Publish `files` as the next snapshot: write the manifest to a temp
    * name, then rename it into place. The rename is atomic and fails on
    * an existing destination — a lost race to the version number aborts
    * loudly rather than dropping a commit. */
  private def commitManifest(spark: SparkSession, base: String, files: Seq[String],
      tag: Option[String] = None, newStats: Seq[String] = Nil): Unit = {
    val f = fs(spark, base)
    val current = currentManifest(spark, base)
    val next = current.map(manifestVersion(_) + 1).getOrElse(0L)
    val name = f"m$next%010d"
    f.mkdirs(manifestDir(base))
    val tmp = new Path(manifestDir(base), s".tmp-${UUID.randomUUID()}")
    // tags travel INSIDE the manifest ('#'-comment lines), so tag
    // visibility and file visibility share the one atomic rename — and
    // EVERY commit (append, replace, compaction) carries the newest
    // MaxTags tags forward, so the idempotence window survives
    // compaction and vacuum instead of dying with its own manifest
    val currentLines = current.map(manifestLines(spark, base, _)).getOrElse(Nil)
    val carried = currentLines.filter(_.startsWith("#tag="))
    val tags = (carried ++ tag.map(t => s"#tag=$t")).takeRight(MaxTags)
    // stats lines travel with their file: carried while the file stays
    // in the manifest, dropped the moment the file is (files going away
    // at compaction must not leave ghost stats behind)
    val live = files.toSet
    val carriedStats = currentLines
      .filter(_.startsWith(StatsPrefix))
      .filter(l => statsLineFile(l).exists(live))
    writeFile(f, tmp, (tags ++ carriedStats ++ newStats ++ files).mkString("\n"))
    val dst = new Path(manifestDir(base), name)
    // HDFS rename fails on an existing destination; POSIX rename(2)
    // (RawLocalFileSystem) OVERWRITES it — so probe explicitly first.
    // In-process racers never reach here concurrently (commitLock);
    // this check turns a cross-process race into the loud conflict on
    // local filesystems too (modulo the unavoidable check-then-rename
    // window — the documented cross-process contract stays single-writer)
    if (f.exists(dst) || !f.rename(tmp, dst))
      throw new java.io.IOException(
        s"snapshot commit conflict: version $name already exists under $base")
  }

  /** Replace the whole table with `df` (dim-snapshot swap, full
    * compaction). `statsCols` opts the commit into per-file min/max
    * recording for those (numeric) columns. */
  def commitReplace(spark: SparkSession, base: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, statsCols: Seq[String] = Nil): Unit =
    commitLock(base).synchronized {
      val staged = stageWrite(spark, base, df, partitionBy)
      commitManifest(spark, base, staged,
        newStats = computeStats(spark, base, staged, statsCols))
    }

  /** Append `df` to the table. Atomic for readers too: the batch's
    * files appear all-at-once at manifest publish, never half-written.
    * With a `tag` (e.g. a streaming batch id), the commit becomes
    * IDEMPOTENT: a replay of an already-committed tag is a no-op —
    * exactly-once landing on top of an at-least-once sink. */
  def commitAppend(spark: SparkSession, base: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, tag: Option[String] = None,
      statsCols: Seq[String] = Nil): Unit =
    // the whole tag-probe → read-current → stage → publish sequence is
    // one critical section: splitting it would let an interleaved
    // writer invalidate the read current version (lost update) or let
    // a replayed tag double-commit past the idempotence probe
    commitLock(base).synchronized {
      if (!tag.exists(hasTag(spark, base, _))) {
        val existing = listFiles(spark, base)
        val staged = stageWrite(spark, base, df, partitionBy)
        commitManifest(spark, base, existing ++ staged, tag,
          newStats = computeStats(spark, base, staged, statsCols))
      }
    }

  /** Exact row count of staged files from their parquet FOOTERS —
    * driver-side metadata reads (one footer per new file, the same
    * order of work as the manifest write), never a Spark job. This is
    * what lets a caller that needs "rows committed" avoid the
    * persist + count() + write double materialization of the data
    * (r15, guide §5: the count used to force the frame once into a
    * cache and once into parquet). */
  private def stagedRowCount(spark: SparkSession, base: String,
      rels: Seq[String]): Long = {
    val hconf = conf(spark)
    rels.map { rel =>
      val p = new Path(s"${dataDir(base)}/$rel")
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** [[commitAppend]] that also returns the number of rows landed,
    * counted from the staged files' footers (no extra job, no caching
    * of the input frame). A zero-row batch commits NOTHING (its empty
    * files are removed; no manifest version is burned) and returns 0 —
    * the same observable behavior as the old
    * `if (count > 0) commitAppend` caller pattern. An
    * already-present idempotence tag is a no-op returning 0. */
  def commitAppendCounted(spark: SparkSession, base: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, tag: Option[String] = None,
      statsCols: Seq[String] = Nil): Long =
    commitLock(base).synchronized {
      if (tag.exists(hasTag(spark, base, _))) 0L
      else {
        val existing = listFiles(spark, base)
        val staged = stageWrite(spark, base, df, partitionBy)
        val n = stagedRowCount(spark, base, staged)
        if (n == 0L) {
          val f = fs(spark, base)
          staged.foreach(rel => f.delete(new Path(s"${dataDir(base)}/$rel"), false))
        } else {
          commitManifest(spark, base, existing ++ staged, tag,
            newStats = computeStats(spark, base, staged, statsCols))
        }
        n
      }
    }

  /** [[commitReplace]] returning the rows committed, counted from the
    * staged footers (the replace ALWAYS commits — replacing a table
    * with an empty snapshot is a legitimate state). */
  def commitReplaceCounted(spark: SparkSession, base: String, df: DataFrame,
      partitionBy: Seq[String] = Nil, statsCols: Seq[String] = Nil): Long =
    commitLock(base).synchronized {
      val staged = stageWrite(spark, base, df, partitionBy)
      commitManifest(spark, base, staged,
        newStats = computeStats(spark, base, staged, statsCols))
      stagedRowCount(spark, base, staged)
    }

  /** Replace exactly one partition's files with `df` (which must be the
    * new content of that partition, carrying the partition column):
    * the partition-scoped compaction path — closed partitions commit
    * without touching the rest of the table. */
  def commitReplacePartition(spark: SparkSession, base: String, df: DataFrame,
      partitionCol: String, partitionValue: String,
      statsCols: Seq[String] = Nil): Unit =
    commitLock(base).synchronized {
      val kept = listFiles(spark, base)
        .filterNot(_.startsWith(s"$partitionCol=$partitionValue/"))
      val staged = stageWrite(spark, base, df, Seq(partitionCol))
      commitManifest(spark, base, kept ++ staged,
        newStats = computeStats(spark, base, staged, statsCols))
    }

  // ---- per-file column statistics (data skipping) -------------------------

  private val StatsPrefix = "#stats="

  private def statsLineFile(line: String): Option[String] =
    line.stripPrefix(StatsPrefix).split("\t", 2).headOption

  /** Min/max per column for the new files, as manifest `#stats=` lines.
    * One aggregate over JUST the staged batch (grouped by physical
    * file), collected as one row PER NEW FILE — manifest-scale
    * metadata, the same order of driver-side state as the manifest
    * write itself, never proportional to the table. Values are widened
    * one ulp each way so the double encoding can never round a true
    * boundary out of its own file (longs past 2^53). Null-only columns
    * are omitted (the file is then always read for them). */
  private def computeStats(spark: SparkSession, base: String,
      newRels: Seq[String], statsCols: Seq[String]): Seq[String] = {
    if (statsCols.isEmpty || newRels.isEmpty) return Nil
    val abs = newRels.map(r => s"${dataDir(base)}/$r")
    val df = spark.read.option("basePath", dataDir(base)).parquet(abs: _*)
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__min_$c"),
      max(col(c)).cast("double").as(s"__max_$c")))
    val rows = df.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*).collect()
    rows.toSeq.flatMap { r =>
      newRels.find(rel => r.getString(0).endsWith(rel)).map { rel =>
        val parts = statsCols.flatMap { c =>
          (Option(r.getAs[java.lang.Double](s"__min_$c")),
            Option(r.getAs[java.lang.Double](s"__max_$c"))) match {
            case (Some(lo), Some(hi)) =>
              Some(s"$c=${Math.nextDown(lo.doubleValue)},${Math.nextUp(hi.doubleValue)}")
            case _ => None
          }
        }
        s"$StatsPrefix$rel\t${parts.mkString(";")}"
      }
    }
  }

  /** Recorded per-file stats of the live snapshot:
    * rel path → column → (min, max). Files or columns without recorded
    * stats are simply absent. */
  def fileStats(spark: SparkSession, base: String): Map[String, Map[String, (Double, Double)]] =
    currentManifest(spark, base).toSeq
      .flatMap(m => manifestLines(spark, base, m))
      .filter(_.startsWith(StatsPrefix))
      .flatMap { line =>
        line.stripPrefix(StatsPrefix).split("\t", 2) match {
          case Array(rel, spec) =>
            val cols = spec.split(";").iterator.filter(_.nonEmpty).flatMap { p =>
              p.split("=", 2) match {
                case Array(c, mm) => mm.split(",", 2) match {
                  case Array(lo, hi) => Some(c -> (lo.toDouble, hi.toDouble))
                  case _ => None
                }
                case _ => None
              }
            }.toMap
            Some(rel -> cols)
          case _ => None
        }
      }.toMap

  /** Live-snapshot files whose recorded [min,max] for `column`
    * intersects [lo, hi]; files without stats for the column are
    * conservatively kept. Pure manifest metadata — no data IO. */
  def pruneFiles(spark: SparkSession, base: String, column: String,
      lo: Double, hi: Double): Seq[String] = {
    val st = fileStats(spark, base)
    listFiles(spark, base).filter { f =>
      st.get(f).flatMap(_.get(column)) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }
  }

  /** Range read with file skipping: only files surviving [[pruneFiles]]
    * are opened (parquet row-group pushdown then prunes further inside
    * them), and the row-level filter is applied on top so the result is
    * EXACTLY the full-scan filter's. None when every file was skipped. */
  def readRange(spark: SparkSession, base: String, column: String,
      lo: Double, hi: Double): Option[DataFrame] = {
    val files = pruneFiles(spark, base, column, lo, hi)
    if (files.isEmpty) None
    else Some(spark.read.option("basePath", dataDir(base))
      .parquet(files.map(f => s"${dataDir(base)}/$f"): _*)
      .filter(col(column) >= lo && col(column) <= hi))
  }

  /** Targeted delete (right-to-be-forgotten / retention purge) with a
    * STATS-PRUNED PARTIAL REWRITE: only files whose recorded [min,max]
    * for `column` can intersect [lo, hi] are rewritten (minus the rows
    * where `column` is in range and `extra` holds); every other file
    * carries over into the new manifest BY REFERENCE, untouched. At
    * 100 TB, purging one user's rows from a user-clustered (sorted or
    * z-ordered) table rewrites the handful of files that can contain
    * them — IO proportional to the delete's footprint, not the table.
    * Files without recorded stats are conservatively rewritten.
    *
    * Returns the number of files rewritten (0 = metadata-only no-op:
    * no new manifest is committed). The rewrite re-records stats for
    * `statsCols` on the replacement files (pass the same columns the
    * table was committed with, or pruning degrades to conservative
    * keeps for them). Atomic: readers see the pre- or post-delete
    * snapshot, never a mix. */
  def deleteRange(spark: SparkSession, base: String, column: String,
      lo: Double, hi: Double, statsCols: Seq[String] = Nil,
      extra: Option[Column] = None): Int =
    commitLock(base).synchronized {
      val affected = pruneFiles(spark, base, column, lo, hi)
      if (affected.isEmpty) 0
      else {
        val keep = listFiles(spark, base).filterNot(affected.toSet)
        val dd = dataDir(base)
        val deletePred = col(column) >= lo && col(column) <= hi &&
          extra.getOrElse(lit(true))
        // three-valued logic: a NULL predicate (null column value) must
        // mean KEEP, not drop — filter(!p) alone would drop null rows
        val survivors = spark.read.option("basePath", dd)
          .parquet(affected.map(f => s"$dd/$f"): _*)
          .filter(not(coalesce(deletePred, lit(false))))
        val staged = stageWrite(spark, base, survivors, Nil)
        commitManifest(spark, base, keep ++ staged,
          newStats = computeStats(spark, base, staged, statsCols))
        affected.size
      }
    }

  /** ClickHouse table-TTL analog with rollup aging — `TTL ts +
    * INTERVAL … GROUP BY k SET v = sum(v)` (MergeTree's "age raw rows
    * into aggregate rows" lifecycle, the 100 TB retention idiom that
    * keeps dashboards serving YEARS of history at day granularity
    * while raw rows only live for days).
    *
    * Rows with `column` < `cutoff` (strict; NULL axis = keep, the
    * [[deleteRange]] three-valued rule) are removed and replaced by
    * `rollup(expiredRows)` — which MUST return the table's own schema
    * (names + types, checked) so rolled rows coexist with raw ones.
    *
    * Stats-pruned partial rewrite, same as [[deleteRange]]: only
    * files whose recorded [min,max] can contain an expired row are
    * read; the rest carry over by reference. Survivors and rollup
    * rows commit in ONE manifest — readers see pre- or post-TTL,
    * never a mix.
    *
    * Re-aggregation contract (part-merge semantics): a later TTL pass
    * re-reads previously-rolled rows whose axis value is still below
    * the (new) cutoff and aggregates them WITH newly-expired raws —
    * so `rollup` must be re-applicable (sum of sums, min of mins:
    * emit re-aggregable columns and a group-stable axis value, e.g.
    * the bucket start). That is exactly how ClickHouse TTL GROUP BY
    * behaves across merges.
    *
    * Returns files rewritten (0 = nothing can be expired:
    * metadata-only no-op). */
  def ttlExpire(spark: SparkSession, base: String, column: String,
      cutoff: Double, rollup: DataFrame => DataFrame,
      statsCols: Seq[String] = Nil): Int =
    commitLock(base).synchronized {
      val affected = pruneFiles(spark, base, column,
        Double.NegativeInfinity, cutoff)
      if (affected.isEmpty) 0
      else {
        val keep = listFiles(spark, base).filterNot(affected.toSet)
        val dd = dataDir(base)
        val scan = spark.read.option("basePath", dd)
          .parquet(affected.map(f => s"$dd/$f"): _*)
        val expiredPred = coalesce(col(column) < cutoff, lit(false))
        val survivors = scan.filter(not(expiredPred))
        val rolled = rollup(scan.filter(expiredPred))
        val want = scan.schema.map(f => (f.name, f.dataType))
        val got = rolled.schema.map(f => (f.name, f.dataType))
        require(got == want,
          s"TTL rollup must preserve the table schema; expected $want, got $got")
        val staged = stageWrite(spark, base, survivors.unionByName(rolled), Nil)
        commitManifest(spark, base, keep ++ staged,
          newStats = computeStats(spark, base, staged, statsCols))
        affected.size
      }
    }

  /** `ALTER TABLE … UPDATE` mutation analog (completing the
    * delete/MERGE/update triad ClickHouse mutations offer): set
    * columns on rows matching `column ∈ [lo, hi]` (AND the optional
    * `extra` predicate) with the same stats-pruned PARTIAL REWRITE as
    * [[deleteRange]] — only files whose recorded [min,max] can contain
    * a matching row are rewritten; the rest carry over by reference.
    *
    * SQL UPDATE semantics: every SET expression is evaluated against
    * the OLD row (one select — `set("a") = col("b"), set("b") =
    * col("a")` swaps), a NULL predicate means keep-unchanged
    * (three-valued logic, the [[deleteRange]] rule), and each SET
    * value is cast back to the column's existing type so the table
    * schema can never drift through a mutation. SET columns must
    * exist. Returns files rewritten (0 = no file can match:
    * metadata-only no-op, no new manifest). Atomic: readers see the
    * pre- or post-update snapshot, never a mix. */
  def updateRange(spark: SparkSession, base: String, column: String,
      lo: Double, hi: Double, set: Map[String, Column],
      statsCols: Seq[String] = Nil, extra: Option[Column] = None): Int =
    commitLock(base).synchronized {
      require(set.nonEmpty, "UPDATE needs at least one SET column")
      val affected = pruneFiles(spark, base, column, lo, hi)
      if (affected.isEmpty) 0
      else {
        val keep = listFiles(spark, base).filterNot(affected.toSet)
        val dd = dataDir(base)
        val pred = coalesce(col(column) >= lo && col(column) <= hi &&
          extra.getOrElse(lit(true)), lit(false))
        val src = spark.read.option("basePath", dd)
          .parquet(affected.map(f => s"$dd/$f"): _*)
        val types = src.schema.map(f => f.name -> f.dataType).toMap
        val missing = set.keySet -- types.keySet
        require(missing.isEmpty, s"SET columns not in table: $missing")
        val rewritten = src.withColumn("__hit", pred)
          .select(src.columns.toSeq.map { c =>
            (set.get(c) match {
              case Some(v) =>
                when(col("__hit"), v.cast(types(c))).otherwise(col(c))
              case None => col(c)
            }).as(c)
          }: _*)
        val staged = stageWrite(spark, base, rewritten, Nil)
        commitManifest(spark, base, keep ++ staged,
          newStats = computeStats(spark, base, staged, statsCols))
        affected.size
      }
    }

  /** Keyed MERGE (CDC apply: upsert + delete in one batch) with the
    * same stats-pruned PARTIAL REWRITE as [[deleteRange]] — the scale
    * path for maintaining a big keyed table (a dimension, an LWW event
    * log) under a change stream: only files whose recorded [min,max]
    * for `keyCol` can contain an affected key are rewritten; the rest
    * carry over by reference.
    *
    * `changes` carries the table's data schema plus a delete verdict
    * (`isDelete` evaluated against it), AT MOST ONE ROW PER KEY
    * (pre-collapse a CDC batch with LWW — [[graft.ops.Dedup.lww]] —
    * upstream). Semantics per change key: existing rows with that key
    * are removed, and unless the change is a delete, the change row is
    * inserted. Rows of untouched keys inside rewritten files survive.
    *
    * The affected-file set is computed DISTRIBUTED: the manifest's
    * per-file ranges (manifest-scale) broadcast against the change
    * keys, and only distinct file names — bounded by the file count,
    * never the batch — reach the driver. Files without recorded key
    * stats are conservatively rewritten. Returns files rewritten; 0 =
    * no change row touches any file AND the batch has no inserts
    * (nothing to commit). */
  def mergeKeyed(spark: SparkSession, base: String, changes: DataFrame,
      keyCol: String, isDelete: Column,
      statsCols: Seq[String] = Nil): Int =
    commitLock(base).synchronized {
      import org.apache.spark.sql.functions.broadcast
      val all = listFiles(spark, base)
      val st = fileStats(spark, base)
      val (ranged, statless) = all.partition(f => st.get(f).exists(_.contains(keyCol)))
      val rangeRows = ranged.map { f =>
        val (lo, hi) = st(f)(keyCol); (f, lo, hi)
      }
      val keyD = col(keyCol).cast("double")
      val affectedRanged: Seq[String] =
        if (rangeRows.isEmpty) Nil
        else {
          val ranges = spark.createDataFrame(rangeRows).toDF("__file", "__lo", "__hi")
          changes.select(keyD.as("__k"))
            .join(broadcast(ranges), col("__k") >= col("__lo") && col("__k") <= col("__hi"))
            .select("__file").distinct().collect().map(_.getString(0)).toSeq
        }
      val affected = (statless ++ affectedRanged).distinct
      val dd = dataDir(base)
      // table schema governs: extra change-side columns (CDC markers)
      // never reach storage
      val tableCols: Seq[String] =
        if (all.nonEmpty)
          spark.read.option("basePath", dd).parquet(s"$dd/${all.head}").columns.toSeq
        else changes.columns.toSeq
      val upserts = changes.filter(not(coalesce(isDelete, lit(false))))
        .select(tableCols.map(col): _*)
      if (affected.isEmpty && upserts.isEmpty) 0
      else {
        val keep = all.filterNot(affected.toSet)
        val survivors =
          if (affected.isEmpty) upserts
          else spark.read.option("basePath", dd)
            .parquet(affected.map(f => s"$dd/$f"): _*)
            .join(changes.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
            .unionByName(upserts)
        val staged = stageWrite(spark, base, survivors, Nil)
        commitManifest(spark, base, keep ++ staged,
          newStats = computeStats(spark, base, staged, statsCols))
        affected.size
      }
    }

  /** RESTORE analog (rollback/roll-forward time travel as a COMMIT):
    * publish a new manifest that re-references the data files of
    * retained version `v` — metadata-only, no data read or written, so
    * restoring a 100 TB table costs two manifest file operations. The
    * restored files' stats lines carry over from the old manifest
    * (deduplicated against files still live), so pruning keeps
    * working; the current idempotence-tag window carries forward as
    * with every commit. Readers see the pre- or post-restore snapshot
    * atomically. Throws FileNotFoundException when `v` was vacuumed. */
  def restore(spark: SparkSession, base: String, v: Long): Unit =
    commitLock(base).synchronized {
      val name = f"m$v%010d"
      val files = manifestFiles(spark, base, name)
      val fileSet = files.toSet
      val cur = listFiles(spark, base).toSet
      val revived = manifestLines(spark, base, name)
        .filter(_.startsWith(StatsPrefix))
        .filter(l => statsLineFile(l).exists(f => fileSet(f) && !cur(f)))
      commitManifest(spark, base, files, newStats = revived)
    }

  // ---- retention ----------------------------------------------------------

  /** Drop manifests older than the newest `keepManifests` and delete
    * data files no surviving manifest references. keepManifests >= 2
    * keeps the previous snapshot alive for in-flight readers. */
  def vacuum(spark: SparkSession, base: String, keepManifests: Int = 2): Unit = {
    val f = fs(spark, base)
    if (!f.exists(manifestDir(base))) return
    val manifests = f.listStatus(manifestDir(base)).map(_.getPath.getName)
      .filter(_.startsWith("m")).sortBy(manifestVersion)
    if (manifests.length <= keepManifests) return
    val (drop, keep) = manifests.splitAt(manifests.length - keepManifests)
    val referenced = keep.flatMap(manifestFiles(spark, base, _)).toSet
    val dataPath = new Path(dataDir(base))
    if (f.exists(dataPath)) {
      val dataUri = f.makeQualified(dataPath).toUri
      val it = f.listFiles(dataPath, true)
      while (it.hasNext) {
        val p = it.next().getPath
        val rel = dataUri.relativize(f.makeQualified(p).toUri).getPath
        if (p.getName.endsWith(".parquet") && !referenced.contains(rel))
          f.delete(p, false)
      }
    }
    drop.foreach(m => f.delete(new Path(manifestDir(base), m), false))
  }

  // ---- incremental consumption --------------------------------------------

  /** Exactly-once incremental processing of the manifest log — the
    * streaming-consumption twin of [[changesBetween]]. Reads the last
    * processed version from `checkpointFile`, hands every later
    * commit's rows to `f` as ONE batch tagged with the new high
    * version, then advances the checkpoint by atomic tmp-write+rename.
    * Returns Some(processed version) or None when already up to date.
    *
    * Delivery contract (mirrors Structured Streaming's): a crash after
    * `f` but before the checkpoint rename replays the batch —
    * at-least-once into `f` — so an `f` that lands through
    * [[commitAppend]] with the batch version as the idempotence tag is
    * exactly-once end-to-end. Driver-side work is two small file reads
    * and a rename; data reads touch only the files new manifests added. */
  def processNew(spark: SparkSession, base: String, checkpointFile: String)(
      f: (DataFrame, Long) => Unit): Option[Long] = {
    val hfs = fs(spark, base)
    val ckPath = new Path(checkpointFile)
    val last: Long =
      if (hfs.exists(ckPath)) readFile(hfs, ckPath).trim.toLong else -1L
    val current = versions(spark, base).lastOption.getOrElse(-1L)
    if (current <= last) return None
    changesBetween(spark, base, last, current).foreach(df => f(df, current))
    val tmp = new Path(ckPath.getParent, s".tmp-ck-${UUID.randomUUID()}")
    hfs.mkdirs(ckPath.getParent)
    writeFile(hfs, tmp, current.toString)
    if (!hfs.rename(tmp, ckPath)) {
      hfs.delete(ckPath, false)
      if (!hfs.rename(tmp, ckPath))
        throw new java.io.IOException(s"cannot advance checkpoint $ckPath")
    }
    Some(current)
  }

  /** Remove crashed-write leftovers: `_stage` dirs and `.tmp-*`
    * manifest files (a completed commit always deletes its stage and
    * renames its tmp). REQUIRES a fully quiesced table — unlike
    * [[vacuum]], this must NOT run alongside a writer, whose in-flight
    * staging dir is indistinguishable from an orphan. */
  def cleanOrphans(spark: SparkSession, base: String): Unit = {
    val f = fs(spark, base)
    val stageRoot = new Path(base, "_stage")
    if (f.exists(stageRoot)) f.delete(stageRoot, true)
    if (f.exists(manifestDir(base)))
      f.listStatus(manifestDir(base)).iterator
        .filter(_.getPath.getName.startsWith(".tmp-"))
        .foreach(s => f.delete(s.getPath, false))
  }
}
