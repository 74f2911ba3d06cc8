package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus partition-parallel decode / feature
  * extraction / frame sampling.
  *
  * STUB NOTICE: no media codecs exist in this environment, so
  * `decodeStub` / `frameSampleStub` are deterministic fakes (byte
  * histograms / byte-range chunks) standing in for e.g. JPEG decode +
  * model embed. Everything AROUND the stub is the real design and is
  * tested: the schema (payload + metadata struct), the batched
  * partition-parallel execution via mapPartitions (the JVM analog of
  * mapInPandas — one decoder instantiation per partition, streaming
  * row batches through it), and the `array<float>` feature shape that
  * feeds graft.similarity.Ann directly.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, format: String,
      width: Int, height: Int, duration_ms: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      features: Array[Float])

  val FeatureDim = 16

  /** Build a media table from the documents fixture: payload = utf-8
    * bytes of text (deterministic), metadata derived from doc_id. */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      element_at(array(lit("jpeg"), lit("wav"), lit("mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      (lit(64) + pmod(col("doc_id"), lit(8)) * 16).cast("int").as("width"),
      (lit(64) + pmod(col("doc_id"), lit(4)) * 16).cast("int").as("height"),
      (pmod(col("doc_id"), lit(30)) * 1000).as("duration_ms"),
      col("text").cast("binary").as("payload"))

  /** STUB decode: 16-bin byte-value histogram, L1-normalized — a
    * deterministic stand-in for codec + model inference. Replace with a
    * real decoder; the signature (bytes in, fixed-dim float vector out)
    * is the contract the pipeline depends on. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](FeatureDim)
    if (payload == null || payload.isEmpty) return bins
    payload.foreach { b => bins((b & 0xFF) / FeatureDim) += 1f }
    val n = payload.length.toFloat
    bins.map(_ / n)
  }

  /** STUB frame sampling: n contiguous byte ranges standing in for
    * decoded video frames. */
  def frameSampleStub(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (payload == null || payload.isEmpty || n <= 0) return Seq.empty
    val step = math.max(1, payload.length / n)
    (0 until math.min(n, payload.length)).map { i =>
      payload.slice(i * step, math.min(i * step + step, payload.length))
    }
  }

  /** The decoder contract: bytes in, fixed-dim float feature vector
    * out. Must be `Serializable` (it ships to executors) and
    * deterministic (re-execution of a failed task must reproduce it).
    * A real deployment injects codec + model inference here; this
    * environment injects [[decodeStub]]. */
  type Decoder = Array[Byte] => Array[Float]

  case class MediaResized(doc_id: Long, media_type: String,
      width: Int, height: Int, payload: Array[Byte])

  /** The resizer contract (the `Decoder` discipline for the resize
    * stage): (payload, srcW, srcH, dstW, dstH) → resized payload.
    * Serializable + deterministic; a real deployment injects a codec's
    * scaler here. */
  type Resizer = (Array[Byte], Int, Int, Int, Int) => Array[Byte]

  /** STUB resize: nearest-neighbor over the payload read as a
    * row-major srcW×srcH byte grid — dst(r, c) = src(⌊r·srcH/dstH⌋,
    * ⌊c·srcW/dstW⌋), source index taken mod payload length (the
    * synthetic payloads aren't truly w·h bytes; a real decoder's
    * buffer is). Pure integer arithmetic, so the whole chain stays
    * hash-checkable cross-engine. */
  def resizeStub(payload: Array[Byte], srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty || dstW <= 0 || dstH <= 0)
      return Array.emptyByteArray
    val out = new Array[Byte](dstW * dstH)
    var r = 0
    while (r < dstH) {
      val sr = r.toLong * srcH / dstH
      var c = 0
      while (c < dstW) {
        val sc = c.toLong * srcW / dstW
        out(r * dstW + c) = payload(((sr * srcW + sc) % payload.length).toInt)
        c += 1
      }
      r += 1
    }
    out
  }

  /** Partition-parallel resize to a fixed target — the normalization
    * pass every vision-training pipeline runs before batching (uniform
    * tensor shapes). Same mapPartitions batch shape as
    * [[extractFeatures]]: per-partition scaler init amortized, rows
    * stream, nothing reaches the driver; metadata (width/height)
    * updates with the payload. */
  def resize(media: DataFrame, dstW: Int, dstH: Int,
      resizer: Resizer = resizeStub): Dataset[MediaResized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "format", "width", "height",
        "duration_ms", "payload")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition scaler init would go here
        rows.map { r =>
          MediaResized(r.doc_id, r.media_type, dstW, dstH,
            resizer(r.payload, r.width, r.height, dstW, dstH))
        }
      }
  }

  /** DuckDB replica of [[resize]] ∘ [[synthesize]] digests: rebuilds
    * each resized payload character-by-character and md5-digests it —
    * the registered query compares the digest, byte count, and updated
    * metadata.
    *
    * Fixture contract (asserted by FixtureCoverageSpec, not just
    * assumed): the documents' text must be ASCII — the rebuild indexes
    * CHARACTERS while the engine indexes UTF-8 BYTES, so byte = char
    * must hold. Empty text needs no fixture guarantee: the engine
    * returns an empty payload for an empty source buffer
    * ([[resizeStub]]'s payload.isEmpty branch), and the oracle mirrors
    * it below (n_bytes 0, digest of the empty string) instead of
    * dividing by a zero modulus. */
  def resizeOracleSql(dstW: Int, dstH: Int): String =
    s"""WITH m AS (SELECT doc_id, CAST(64 + (doc_id % 8) * 16 AS BIGINT) AS w, CAST(64 + (doc_id % 4) * 16 AS BIGINT) AS h, text, length(text) AS len FROM documents),
px AS (SELECT doc_id, t.i AS i,
  substring(text, CAST((((t.i // $dstW) * h // $dstH) * w + ((t.i % $dstW) * w // $dstW)) % len AS INTEGER) + 1, 1) AS ch
 FROM m, LATERAL unnest(range(0, ${dstW.toLong * dstH})) AS t(i) WHERE len >= 1),
dg AS (SELECT doc_id, md5(string_agg(ch, '' ORDER BY i)) AS resized_md5 FROM px GROUP BY doc_id)
SELECT m.doc_id, $dstW AS width, $dstH AS height,
  CASE WHEN m.len >= 1 THEN ${dstW * dstH} ELSE 0 END AS n_bytes,
  CASE WHEN m.len >= 1 THEN dg.resized_md5 ELSE md5('') END AS resized_md5
FROM m LEFT JOIN dg ON m.doc_id = dg.doc_id"""

  /** Partition-parallel feature extraction: the INJECTED decoder is
    * applied per-partition (mapPartitions ≈ mapInPandas batch shape:
    * amortize per-task decoder setup across the partition's rows,
    * never collect to the driver). Swapping the stub for a real
    * JPEG/WAV decoder changes only the argument, none of the plan. */
  def extractFeatures(media: DataFrame,
      decoder: Decoder = decodeStub): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "format", "width", "height",
        "duration_ms", "payload")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec handles, model)
        rows.map { r =>
          MediaFeatures(r.doc_id, r.media_type,
            Option(r.payload).map(_.length).getOrElse(0),
            decoder(r.payload))
        }
      }
  }

  /** The composed end-to-end pipeline: synthesize media columns →
    * decode features (injected decoder) → k-means cluster → semantic
    * near-dup verdict within clusters ([[graft.similarity.Ann.semDedup]]
    * over the decoded features). One Spark plan, no driver
    * materialization beyond the k×dim centroids; at 100 TB the shape is
    * identical — decode is map-only, clustering bounds the pair join.
    * Output: (doc_id, media_type, n_bytes, cent_id, keep). */
  def pipeline(docs: DataFrame, threshold: Double, nCentroids: Int = 8,
      kmeansIters: Int = 3, decoder: Decoder = decodeStub): DataFrame = {
    import org.apache.spark.sql.functions.col
    val feats = extractFeatures(synthesize(docs), decoder).toDF()
    val emb = feats.select(col("doc_id").as("vec_id"), col("features").as("embedding"))
    val verdict = graft.similarity.Ann.semDedup(
      emb, col("vec_id"), col("embedding"), threshold, nCentroids, kmeansIters)
    feats.select(col("doc_id"), col("media_type"), col("n_bytes"))
      .join(verdict.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("cent_id"), col("keep"))
  }

  /** DuckDB SQL replaying synthesize → extractFeatures bit-for-bit over
    * table `documents`: the stub histogram bin k counts payload bytes
    * with high nibble k (char 2i-1 of hex(payload)), normalized in
    * FLOAT32 (`REAL` division — matching the stub's Float arithmetic
    * exactly), widened to double and floor-rounded to millionths. The
    * "decode" is a declared deterministic fake, but its Spark-side
    * plumbing (binary payload column, partition-parallel decode, fixed
    * feature dim) is exercised for real and the output hash-checked. */
  /** Bin k of the stub histogram as a DOUBLE-typed DuckDB expression
    * over columns (n, nibs) — REAL division replaying the stub's Float
    * arithmetic, then widened to double exactly like Spark's
    * float→double cast. */
  private def binSql(k: Int): String = {
    val d = "0123456789ABCDEF"(k)
    s"CAST(CASE WHEN n > 0 THEN CAST(len(list_filter(nibs, c -> c = '$d')) AS REAL) / CAST(n AS REAL) ELSE CAST(0 AS REAL) END AS DOUBLE)"
  }

  private val mediaTypeSql =
    "CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

  /** CTEs computing (vec_id, media_type, n_bytes, v DOUBLE[16]) — the
    * synthesize→decode stages — as CTE `featsrc` over `documents`. */
  private def featSrcCtes: String =
    s"""mb AS (SELECT doc_id, encode(text) AS p FROM documents),
mnb AS (SELECT doc_id, octet_length(p) AS n, hex(p) AS h FROM mb),
mnib AS (SELECT doc_id, n, list_transform(range(1, n+1), i -> h[2*i-1]) AS nibs FROM mnb),
featsrc AS (SELECT doc_id AS vec_id, $mediaTypeSql AS media_type, CAST(n AS INTEGER) AS n_bytes, ${(0 until FeatureDim).map(binSql).mkString("[", ", ", "]")} AS v FROM mnib)"""

  def featuresOracleSql(): String = {
    val fCols = (0 until FeatureDim).map { k =>
      s"CAST(floor(${binSql(k)} * 1000000.0 + 0.5) AS BIGINT) AS f${k}_millionths"
    }.mkString(", ")
    s"""WITH b AS (SELECT doc_id, encode(text) AS p FROM documents),
nb AS (SELECT doc_id, octet_length(p) AS n, hex(p) AS h FROM b),
nib AS (SELECT doc_id, n, list_transform(range(1, n+1), i -> h[2*i-1]) AS nibs FROM nb)
SELECT doc_id, $mediaTypeSql AS media_type, CAST(n AS INTEGER) AS n_bytes, $fCols FROM nib"""
  }

  /** DuckDB SQL replaying [[pipeline]] end-to-end — synthesize, stub
    * decode, the whole k-means fit ([[graft.similarity.KMeans.ctes]]
    * over the feature vectors), within-cluster cosine pairs, and the
    * keep-lowest-id drop rule — bit-for-bit hash-checkable. */
  def pipelineOracleSql(threshold: Double, nCentroids: Int = 8,
      kmeansIters: Int = 3): String = {
    import graft.similarity.KMeans
    def dot(a: String, b: String) = KMeans.dotSql(a, b)
    val cos = s"CASE WHEN a.nrm > 0 AND b.nrm > 0 THEN ${dot("a.v", "b.v")} / (a.nrm * b.nrm) END"
    val centCos = s"CASE WHEN e.nrm > 0 AND c.cnrm > 0 THEN ${dot("e.v", "c.cv")} / (e.nrm * c.cnrm) END"
    s"""WITH $featSrcCtes,
${KMeans.ctes(nCentroids, kmeansIters, FeatureDim, vecSql = "v", fromSql = "featsrc")},
corpus AS (SELECT vec_id, v, nrm, cent_id FROM (SELECT e.vec_id, e.v, e.nrm, c.cent_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY ($centCos) DESC NULLS LAST, c.cent_id ASC) AS rn FROM e, cents_$kmeansIters c) WHERE rn = 1),
prs AS (SELECT b.vec_id AS id_b, $cos AS cosine FROM corpus a JOIN corpus b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id),
drp AS (SELECT DISTINCT id_b AS vec_id FROM prs WHERE cosine >= $threshold)
SELECT c.vec_id AS doc_id, f.media_type, f.n_bytes, c.cent_id, (d.vec_id IS NULL) AS keep FROM corpus c JOIN featsrc f ON c.vec_id = f.vec_id LEFT JOIN drp d ON c.vec_id = d.vec_id"""
  }
}
