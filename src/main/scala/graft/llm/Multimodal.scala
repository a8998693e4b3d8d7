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

  /** FRAME SAMPLING plumbing — the video-pipeline step (sample every k-th
    * frame of each clip for captioning/embedding). Real video DECODE needs
    * codec libraries this container deliberately lacks, so the container
    * model is stubbed: a payload is treated as fixed-size `frameBytes`
    * chunks (a deterministic fake "keyframe index"). What IS real — and
    * what the gate pins byte-for-byte — is the Spark-side plumbing a real
    * pipeline needs unchanged: in-row frame enumeration (explode over a
    * per-row computed sequence — zero shuffle, no UDF), every-k sampling
    * BEFORE byte extraction (skipped frames are never materialized),
    * byte-range extraction per sampled frame, and stable (doc_id,
    * frame_idx) keys. Swap the chunker for a codec's keyframe offsets and
    * the plan is identical. Output: (doc_id, frame_idx, frame_bytes,
    * frame_hex) — hex because the gate compares content, and hex() is
    * byte-identical across engines. */
  def frameSample(docs: DataFrame, frameBytes: Int = 256,
                  everyK: Int = 4): DataFrame = {
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be > 0")
    val hexFrame = 2 * frameBytes
    mediaFrame(docs)
      .filter(length(col("payload")) > 0)
      .select(col("doc_id"), hex(col("payload")).as("hexp"),
        explode(sequence(lit(0),
          ceil(length(col("payload")).cast(DoubleType) / frameBytes)
            .cast(IntegerType) - 1)).as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(everyK)) === 0)
      .withColumn("frame_hex",
        col("hexp").substr(col("frame_idx") * hexFrame + 1, lit(hexFrame)))
      .select(col("doc_id"), col("frame_idx").cast(LongType).as("frame_idx"),
        (length(col("frame_hex")) / 2).cast(LongType).as("frame_bytes"),
        col("frame_hex"))
  }

  /** NEAREST-NEIGHBOR RESIZE plumbing — the image-pipeline normalization
    * step. Pixel decode is the stub (the raster is payload bytes tiled
    * row-major over the codec-reported fake dims — no pixel libs in the
    * container, by design); the resize itself is the real work and is
    * replayed byte-for-byte by the DuckDB oracle: per output pixel (x, y)
    * the source index is (⌊y·srcH/outH⌋·srcW + ⌊x·srcW/outW⌋) mod
    * byteLen. The gather runs as the native codegen'd
    * [[graft.functions.ResizeNearestNN]] over the raw payload bytes —
    * the earlier hex(payload) + 256-element `transform`-of-`substr`
    * formulation evaluated the HOF interpreted at ~400 µs CPU/row; the
    * native expression is the same values at integer-gather cost. One
    * in-row expression per document, zero shuffle, outW·outH bounded
    * per-row work. Output: (doc_id, src_w, src_h, out_hex) with
    * outW·outH bytes of hex. */
  def resizeNearest(docs: DataFrame, outW: Int = 16, outH: Int = 16): DataFrame = {
    require(outW > 0 && outH > 0, "output dims must be > 0")
    graft.functions.ResizeNearestNN.register(docs.sparkSession)
    mediaFrame(docs)
      .filter(length(col("payload")) > 0)
      .withColumn("src_w", (length(col("payload")) * 7 % 640 + 16).cast(LongType))
      .withColumn("src_h",
        ((ascii(col("payload").cast(StringType)) * 13) % 480 + 16).cast(LongType))
      .select(col("doc_id"), col("src_w"), col("src_h"),
        expr(s"${graft.functions.ResizeNearestNN.FunctionName}(" +
          s"payload, src_w, src_h, $outW, $outH)").as("out_hex"))
  }

  /** 60-bit SimHash over DISTINCT sliding byte shingles of the payload —
    * the media analogue of [[Dedup.simhashFingerprints]]: the payload's
    * hex form is windowed into `shingleBytes`-byte (2·shingleBytes hex
    * char) shingles at every byte offset, distinct shingles hash through
    * the same [[graft.functions.Hash60Array]] + codegen'd
    * [[graft.functions.SimHash60]] pass. Byte-identical payloads get
    * identical fingerprints; a re-encode that rewrites a few header
    * bytes disturbs only the shingles covering them — a small Hamming
    * distance. Payloads shorter than one shingle (incl. empty) are
    * excluded, like zero-token docs in the text family. Map-only.
    *
    * `stride` samples shingle START OFFSETS every `stride` bytes instead
    * of every byte: the exploded row stream shrinks from payload-bytes to
    * payload-bytes/stride — the knob that keeps a 100 TB image corpus'
    * shingle fan-out sub-corpus-sized. Identical payloads still get
    * identical fingerprints at any stride; the trade is sensitivity, not
    * recall of the banding (a changed byte is covered by ⌈w/stride⌉
    * shingles instead of w, so light re-encodes perturb FEWER fingerprint
    * bits — if anything near-dups land closer in Hamming space, while the
    * fingerprint distinguishes unrelated payloads slightly less). */
  def byteShingleFingerprints(media: DataFrame,
                              shingleBytes: Int = 8,
                              stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    graft.functions.SimHash60.register(media.sparkSession)
    graft.functions.Hash60Array.register(media.sparkSession)
    val w = 2 * shingleBytes
    media.withColumn("__hx__", hex(col("payload")))
      .select(col("doc_id"),
        explode(when(length(col("__hx__")) >= w,
          array(expr(s"${graft.functions.SimHash60.FunctionName}(" +
            s"${graft.functions.Hash60Array.FunctionName}(array_distinct(" +
            s"transform(sequence(1, length(__hx__) - ${w - 1}, ${2 * stride}), " +
            s"i -> substring(__hx__, i, $w)))))")))).as("fp"))
  }

  /** The 8-bin byte histogram of [[FakeCodec]] as a pure column
    * expression over the payload (first 64 bytes, bin = byte mod 8,
    * normalized) — the decode-free path for pair scoring, identical
    * values to [[decodeFeatures]]'s histogram. */
  private def histExpr: org.apache.spark.sql.Column =
    expr("""CASE WHEN length(__hx__) >= 2
           | THEN transform(sequence(0, 7), b -> size(filter(
           |   transform(sequence(1, 2 * least(length(__hx__) div 2, 64) - 1, 2),
           |     i -> cast(conv(substring(__hx__, i, 2), 16, 10) as int) % 8),
           |   x -> x = b)) / cast(least(length(__hx__) div 2, 64) as double))
           | ELSE transform(sequence(0, 7), b -> 0.0d) END""".stripMargin)

  /** Media near-duplicate detection (r11 verdict item 6): byte-shingle
    * SimHash proposes candidates through the SAME 4×15-bit banded
    * hamming buckets as [[Dedup.simhashPairs]] (any equal band →
    * candidate, `maxBucket` degenerate-bucket guard), each surviving
    * pair additionally scored by the cosine of the deterministic
    * [[FakeCodec]] byte-histogram features — the two signals every
    * multimodal corpus pipeline wants side by side: container-level
    * byte similarity (catches exact copies and light re-encodes) and
    * content-feature similarity (ranks what the bytes share).
    *
    * Recall contract, same as every LSH family here: hamming ≤ 3 pairs
    * are GUARANTEED candidates (4 bands, pigeonhole); heavier
    * re-encodes surface when a band survives — the oracle replicates
    * the banding, so the gate pins the exact recall behavior.
    *
    * Scale shape: fingerprints and histograms are map-only over one
    * payload scan each; pair generation is the bucket-groupBy explode
    * ([[Dedup.simhashBandPairs]] — never all-pairs); the histogram
    * joins touch only the surviving pair list. `stride` (default 4)
    * divides the shingle fan-out — the ONE corpus-bytes-sized row stream
    * in the pipeline — by its value; see [[byteShingleFingerprints]] for
    * the (mild, sensitivity-side) trade. stride = 1 restores the
    * every-offset definition. Output: (doc_a, doc_b, hamming,
    * feat_cos). */
  def mediaNearDup(media: DataFrame, maxHamming: Int = 8,
                   maxBucket: Int = 10000, stride: Int = 4): DataFrame = {
    val pairs = Dedup.simhashBandPairs(
      byteShingleFingerprints(media, stride = stride), maxHamming, maxBucket)
    val hists = media.withColumn("__hx__", hex(col("payload")))
      .select(col("doc_id"), histExpr.as("__hist__"))
    val cos = round(
      expr("aggregate(zip_with(__ha__, __hb__, (x, y) -> x * y), 0D, (a, x) -> a + x)") /
        (sqrt(expr("aggregate(__ha__, 0D, (a, x) -> a + x * x)")) *
          sqrt(expr("aggregate(__hb__, 0D, (a, x) -> a + x * x)"))), 6)
    pairs
      .join(hists.select(col("doc_id").as("doc_a"), col("__hist__").as("__ha__")), "doc_a")
      .join(hists.select(col("doc_id").as("doc_b"), col("__hist__").as("__hb__")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming"), cos.as("feat_cos"))
  }
}
