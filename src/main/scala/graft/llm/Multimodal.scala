package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads as opaque `binary` columns with
  * typed metadata, batch-decoded per partition.
  *
  * The container has no image/audio codecs, so [[FakeCodec]] is a clearly
  * marked deterministic stand-in; the Spark-side plumbing — binary schema,
  * typed Dataset, per-partition batch decode, feature explosion — is real and
  * is exactly what a libjpeg/ffmpeg-backed codec would plug into.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int, features: Array[Double])

  /** STUB CODEC: a real implementation would decode the payload (JPEG/PNG/
    * WAV...) here. This fake derives deterministic "dimensions" and an
    * 8-bin byte histogram over the first 64 bytes, so the pipeline shape
    * (batched per-partition decode → fixed-length feature vector) is real. */
  object FakeCodec {
    def decode(payload: Array[Byte]): MediaFeatures = {
      val head = payload.take(64)
      val hist = new Array[Double](8)
      head.foreach(b => hist((b & 0xff) % 8) += 1.0)
      val n = math.max(head.length, 1)
      MediaFeatures(0L, (payload.length * 7) % 640 + 16,
        ((if (payload.nonEmpty) payload(0) & 0xff else 0) * 13) % 480 + 16,
        hist.map(_ / n))
    }
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
      rows.map(r => FakeCodec.decode(r.payload).copy(doc_id = r.doc_id))
    }
  }

  /** Exploded (doc_id, dim, feature) long form of the decoded features. */
  def features(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeFeatures(spark, docs)
      .select(col("doc_id"), posexplode(col("features")).as(Seq("dim", "feature")))
      .withColumn("feature", round(col("feature"), 6))
}
