package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads as opaque `binary` columns with
  * typed metadata, batch-decoded per partition.
  *
  * The decode step is real for the container formats a header parse can
  * serve without a codec library — PNG/JPEG/GIF/BMP dimensions and channel
  * counts via [[MediaCodec]]. Payloads that aren't recognized media (like
  * the text-derived blobs in the synthetic corpus) fall back to the
  * deterministic [[FakeCodec]] features, which keeps the gate query
  * oracle-checkable in DuckDB. The plumbing — binary schema, typed Dataset,
  * per-partition batch decode, feature explosion — is shared by both paths.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, format: String, width: Int, height: Int,
      channels: Int, features: Array[Double])

  /** Deterministic fallback for unrecognized payloads: fake "dimensions"
    * from payload length/first byte plus an 8-bin byte histogram over the
    * first 64 bytes — a stable, oracle-reproducible feature vector. */
  object FakeCodec {
    def decode(payload: Array[Byte]): MediaFeatures =
      MediaFeatures(0L, "raw", (payload.length * 7) % 640 + 16,
        ((if (payload.nonEmpty) payload(0) & 0xff else 0) * 13) % 480 + 16,
        0, byteHistogram(payload))
  }

  private def byteHistogram(payload: Array[Byte]): Array[Double] = {
    val head = payload.take(64)
    val hist = new Array[Double](8)
    head.foreach(b => hist((b & 0xff) % 8) += 1.0)
    val n = math.max(head.length, 1)
    hist.map(_ / n)
  }

  /** Decode one payload: real header parse first, deterministic fallback
    * otherwise. Total — malformed media can't throw (MediaCodec is
    * bounds-checked and returns None). */
  def decode(payload: Array[Byte]): MediaFeatures =
    MediaCodec.sniff(payload) match {
      case Some(m) => MediaFeatures(0L, m.format, m.width, m.height, m.channels, byteHistogram(payload))
      case None    => FakeCodec.decode(payload)
    }

  /** Attach a binary payload column (derived from text here; in production
    * this is the stored media bytes). */
  def mediaFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast(BinaryType).as("payload"))

  /** Metadata extraction: pure column expressions over the binary payload —
    * no decode needed, stays in whole-stage codegen. */
  def metadata(docs: DataFrame): DataFrame =
    mediaFrame(docs).select(
      col("doc_id"),
      length(col("payload")).cast(LongType).as("byte_len"),
      ascii(col("payload").cast(StringType)).cast(LongType).as("first_cp"),
      substring(md5(col("payload")), 1, 16).as("md5_prefix"),
      ((length(col("payload")) * 7) % 640 + 16).cast(LongType).as("fake_width"))

  /** Batched per-partition decode into typed features. `mapPartitions` is
    * deliberate: a real codec amortizes init (decoder contexts, model
    * weights) across the partition — the same shape as a Pandas-UDF batch. */
  def decodeFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaFrame(docs).as[MediaRow].mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map(r => decode(r.payload).copy(doc_id = r.doc_id))
    }
  }

  /** Exploded (doc_id, dim, feature) long form of the decoded features. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeFeatures(spark, docs)
      .select(col("doc_id"), posexplode(col("features")).as(Seq("dim", "feature")))
      .withColumn("feature", round(col("feature"), 6))
}
