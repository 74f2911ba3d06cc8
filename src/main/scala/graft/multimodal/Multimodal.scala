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

  /** Partition-parallel feature extraction: the decoder is applied
    * per-partition (mapPartitions ≈ mapInPandas batch shape: amortize
    * per-task decoder setup across the partition's rows, never collect
    * to the driver). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
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
            decodeStub(r.payload))
        }
      }
  }

  /** DuckDB SQL replaying synthesize → extractFeatures bit-for-bit over
    * table `documents`: the stub histogram bin k counts payload bytes
    * with high nibble k (char 2i-1 of hex(payload)), normalized in
    * FLOAT32 (`REAL` division — matching the stub's Float arithmetic
    * exactly), widened to double and floor-rounded to millionths. The
    * "decode" is a declared deterministic fake, but its Spark-side
    * plumbing (binary payload column, partition-parallel decode, fixed
    * feature dim) is exercised for real and the output hash-checked. */
  def featuresOracleSql(): String = {
    val hexDigits = "0123456789ABCDEF"
    val fCols = (0 until FeatureDim).map { k =>
      val d = hexDigits(k)
      s"CAST(floor(CAST(CASE WHEN n > 0 THEN CAST(len(list_filter(nibs, c -> c = '$d')) AS REAL) / CAST(n AS REAL) ELSE CAST(0 AS REAL) END AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS f${k}_millionths"
    }.mkString(", ")
    s"""WITH b AS (SELECT doc_id, encode(text) AS p FROM documents),
nb AS (SELECT doc_id, octet_length(p) AS n, hex(p) AS h FROM b),
nib AS (SELECT doc_id, n, list_transform(range(1, n+1), i -> h[2*i-1]) AS nibs FROM nb)
SELECT doc_id, CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type, CAST(n AS INTEGER) AS n_bytes, $fCols FROM nib"""
  }
}
