package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `BinaryType` payloads with
  * typed metadata, processed partition-wise.
  *
  * The Spark-side contract is the real thing — binary column + metadata
  * schema, per-partition batched processing (the Scala analog of
  * `mapInPandas`), deterministic output — while the actual media decode is
  * a clearly marked STUB ([[FakeCodec]]): this container has no
  * image/audio libraries, so payloads are derived from `documents.text`
  * bytes and "decoding" computes deterministic pseudo-dimensions. Swapping
  * [[FakeCodec]] for a JNI/javacpp decoder changes nothing structural.
  */
object Multimodal {

  case class MediaFeature(doc_id: Long, n_bytes: Long, payload_md5: String,
                          width: Int, height: Int)

  /** STUB media codec — deterministic stand-in for image decode.
    * Real deployment: replace `decode` with an actual codec; the
    * partition-wise batch loop in [[extractFeatures]] stays unchanged. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int) = {
      // ??? — real codec goes here; deterministic fake dimensions
      // (height = first Unicode codepoint, matching the oracle's ascii()
      // semantics for non-ASCII leading characters too):
      val width = payload.length % 640
      val height =
        if (payload.isEmpty) 0 else new String(payload, "UTF-8").codePointAt(0)
      (width, height)
    }
  }

  /** Attach a binary payload column (media stand-in = UTF-8 text bytes). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Video-style frame sampling over a payload column, fully relational:
    * the payload is segmented into fixed-size frames, every `everyK`-th
    * frame is kept, and each kept frame is fingerprinted. Output:
    * (doc_id, frame_idx, frame_md5, n_frames).
    *
    * This is the Spark-side plumbing of a frame-sample stage — schema,
    * explode shape, per-frame hashing — with the frame decode left to the
    * codec boundary exactly like [[FakeCodec]]: here a "frame" is a
    * `frameChars`-character slice of the text stand-in (a real deployment
    * slices `BinaryType` video at I-frame offsets inside the same plan).
    * Everything stays inside codegen: sequence+explode fans out frame
    * indices, `substr`+`md5` are native expressions, and the modulo filter
    * is pushed below the explode output — no per-row driver logic, no UDF,
    * so the stage scales linearly with total corpus bytes. */
  def frameSample(docs: DataFrame, frameChars: Int, everyK: Int): DataFrame = {
    val framed = docs.select(col("doc_id"), col("text"),
        ceil(length(col("text")).cast(DoubleType) / frameChars)
          .cast(IntegerType).as("n_frames"))
      .where(col("n_frames") > 0)
    framed
      .select(col("doc_id"), col("text"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .where(col("frame_idx") % everyK === 0)
      .select(col("doc_id"), col("frame_idx"),
        md5(col("text").substr(col("frame_idx") * frameChars + 1, lit(frameChars))
          .cast(BinaryType)).as("frame_md5"),
        col("n_frames"))
  }

  /** Deterministic "resize": nearest-neighbor downsampling of the payload
    * stand-in — keep every `stride`-th character, fingerprint the result.
    * Output: (doc_id, n_chars, r_chars, resized_md5).
    *
    * The real-media version replaces the character sampler with the codec's
    * pixel resampler inside the same plan; what this pins is the Spark-side
    * shape: per-row sampling is a pure column expression (no shuffle, no
    * UDF serialization), so resize composes with scan pruning and runs at
    * input bandwidth. The per-character lambda runs on ~len/stride chars
    * per doc — small constants; swap in a native expression if a profile
    * ever shows it hot. */
  def resize(docs: DataFrame, stride: Int): DataFrame = {
    val idx = sequence(lit(0), length(col("text")) - 1, lit(stride))
    val sampled = concat_ws("",
      transform(idx, i => col("text").substr(i + lit(1), lit(1))))
    docs.where(length(col("text")) > 0)
      .select(col("doc_id"),
        length(col("text")).as("n_chars"),
        size(idx).as("r_chars"),
        md5(sampled.cast(BinaryType)).as("resized_md5"))
  }

  /** Partition-wise feature extraction over binary payloads. One codec
    * instantiation per PARTITION (not per row) — the property that matters
    * when the decoder holds native resources; rows stream through without
    * materializing the partition. */
  def extractFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    withPayload(docs).as[(Long, Array[Byte])].mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
      batch.map { case (id, payload) =>
        md.reset()
        val digest = md.digest(payload).map("%02x".format(_)).mkString
        val (w, h) = FakeCodec.decode(payload)
        MediaFeature(id, payload.length.toLong, digest, w, h)
      }
    }
  }
}
