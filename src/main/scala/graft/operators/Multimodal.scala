package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `BinaryType` payloads with
  * typed metadata, processed partition-wise.
  *
  * The Spark-side contract — binary column + metadata schema,
  * per-partition batched processing (the Scala analog of `mapInPandas`),
  * deterministic output — is the real thing, and for IMAGES and AUDIO the
  * decode is too: [[ImageIoCodec]] parses actual PNG bytes through the
  * JDK's `javax.imageio` ([[imageDims]] round-trips encode → decode →
  * pixel stats) and [[WavCodec]] real WAV containers through
  * `javax.sound.sampled` ([[audioStats]]). Payloads the JDK cannot decode
  * (the text stand-ins for video/webp, whose codecs this container lacks)
  * fall back to the clearly marked [[FakeCodec]] STUB; swapping it for a
  * JNI/javacpp decoder changes nothing structural.
  */
object Multimodal {

  case class MediaFeature(doc_id: Long, n_bytes: Long, payload_md5: String,
                          width: Int, height: Int)

  case class ImageDims(doc_id: Long, width: Long, height: Long,
                       mean_r: Long, mean_g: Long, mean_b: Long)

  case class ImageHash(doc_id: Long, ahash: String)

  /** STUB media codec — deterministic stand-in for decoding payload types
    * the JDK has no codec for (audio/video/webp...). Real deployment:
    * replace `decode` with an actual codec; the partition-wise batch loop
    * in [[extractFeatures]] stays unchanged. */
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

  /** REAL image codec over the JDK's built-in `javax.imageio` readers
    * (PNG/GIF/BMP/JPEG — no external media library needed). In-memory
    * only: ImageIO's default disk-backed stream cache would bottleneck a
    * 32-thread partition scan on temp-file churn. */
  object ImageIoCodec {
    javax.imageio.ImageIO.setUseCache(false)

    /** PNG signature sniff (payloads in this engine are either real PNGs
      * or text stand-ins, which can never start with the 0x89 byte). */
    def isPng(payload: Array[Byte]): Boolean =
      payload.length >= 8 &&
        payload(0) == 0x89.toByte && payload(1) == 'P'.toByte &&
        payload(2) == 'N'.toByte && payload(3) == 'G'.toByte

    def decode(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload")
      img
    }

    /** Deterministic two-tone grayscale PNG: the left `k` of 8 columns at
      * `bright`, the rest at `dark` — the non-degenerate test pattern for
      * perceptual hashing (a solid image aHashes to all-ties). */
    def encodeTwoTonePng(k: Int, bright: Int, dark: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val v = if (x < k) bright else dark
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic solid-RGB PNG (the synthetic payload generator —
      * real deployments read payloads from the lake instead). */
    def encodePng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  case class AudioHash(doc_id: Long, fp: Long)

  case class AudioStats(doc_id: Long, sample_rate: Long, n_samples: Long,
                        peak: Long, mean_abs: Long)

  /** REAL audio codec over the JDK's built-in `javax.sound.sampled` WAV
    * reader/writer (PCM — no external media library needed), the audio
    * analog of [[ImageIoCodec]]: little-endian signed 16-bit mono. PCM is
    * lossless, so decoded samples are bit-equal to what was encoded —
    * which is what lets the [[audioStats]] oracle predict decoder-observed
    * statistics from the synthesis rule alone. */
  object WavCodec {
    import javax.sound.sampled._

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** (sampleRate, samples) as the DECODER reports them. */
    def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        out(i) = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
        i += 1
      }
      (ais.getFormat.getSampleRate.toInt, out)
    }
  }

  /** The binary payload column: passed through untouched when the input
    * already carries one (the lake-table case — real media bytes), else
    * derived as the UTF-8 text stand-in. */
  def withPayload(docs: DataFrame): DataFrame =
    if (docs.columns.contains("payload")) docs.select(col("doc_id"), col("payload"))
    else docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

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
        // real decode for payloads the JDK can parse, stub for the rest
        val (w, h) =
          if (ImageIoCodec.isPng(payload)) {
            val img = ImageIoCodec.decode(payload)
            (img.getWidth, img.getHeight)
          } else FakeCodec.decode(payload)
        MediaFeature(id, payload.length.toLong, digest, w, h)
      }
    }
  }

  /** Average-hash (aHash) over DECODED pixels: 8×8 grayscale, one bit per
    * pixel (gray > integer image mean), rendered as 16 hex chars — the
    * perceptual-dedup primitive (identical hash ⇒ perceptually identical
    * under the 64-bit summary; Hamming-near hashes ⇒ near-dups). All
    * arithmetic is integer (gray = (r+g+b)/3 floor, mean = Σgray/64
    * floor), so the hash is bit-reproducible.
    *
    * The synthetic payload is a two-tone PNG whose bright-column count
    * derives from the row (1 + doc_id % 7) — real decode, oracle-
    * predictable hash. Encode+decode+hash run in one `mapPartitions`
    * pass; on a lake the generator disappears and the decoder's 8×8
    * downscale replaces the fixed-size pattern. */
  def imageAHash(spark: SparkSession, docs: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    docs.select(col("doc_id"),
        (pmod(col("doc_id"), lit(7)) + 1).cast(IntegerType).as("k"))
      .as[(Long, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, k) =>
          val img = ImageIoCodec.decode(ImageIoCodec.encodeTwoTonePng(k, 200, 40))
          val gray = Array.ofDim[Int](64)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val p = img.getRGB(x, y)
              gray(y * 8 + x) = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          val mean = gray.sum / 64
          val bytes = (0 until 8).map { row =>
            (0 until 8).foldLeft(0) { (acc, x) =>
              if (gray(row * 8 + x) > mean) acc | (1 << (7 - x)) else acc
            }
          }
          ImageHash(id, bytes.map(b => f"$b%02x").mkString)
        }
      }
  }

  /** Perceptual image dedup: aHash clusters with min-id cluster
    * representative — the image-side [[Dedup.exact]] keep-list. Output:
    * (doc_id, ahash, cluster_id). */
  def imageDedup(spark: SparkSession, docs: DataFrame): DataFrame = {
    val h = imageAHash(spark, docs).toDF()
    val reps = h.groupBy(col("ahash")).agg(min(col("doc_id")).as("cluster_id"))
    h.join(reps, "ahash").select(col("doc_id"), col("ahash"), col("cluster_id"))
  }

  /** REAL image decode end-to-end: per document a synthetic solid-color
    * PNG (dimensions and color derived arithmetically from the row, so
    * the DuckDB oracle can predict them without any image library), then
    * `javax.imageio` parses those actual PNG bytes back and reports the
    * DECODED width/height and per-channel pixel means. Encode and decode
    * both run inside one `mapPartitions` pass — no payload shuffle, no
    * driver involvement, codec state per partition; on a real lake the
    * generator side disappears and the same decode loop reads the binary
    * column. Output: (doc_id, width, height, mean_r, mean_g, mean_b),
    * all BIGINT for oracle schema parity. */
  def imageDims(spark: SparkSession, docs: DataFrame): Dataset[ImageDims] = {
    import spark.implicits._
    docs.select(col("doc_id"),
        (pmod(col("doc_id"), lit(64)) + 1).cast(IntegerType).as("w"),
        (pmod(length(col("text")), lit(48)) + 1).cast(IntegerType).as("h"),
        pmod(col("doc_id") * 7, lit(256)).cast(IntegerType).as("r"),
        pmod(col("doc_id") * 11, lit(256)).cast(IntegerType).as("g"),
        pmod(col("doc_id") * 13, lit(256)).cast(IntegerType).as("b"))
      .as[(Long, Int, Int, Int, Int, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, w, h, r, g, b) =>
          val img = ImageIoCodec.decode(ImageIoCodec.encodePng(w, h, r, g, b))
          val (dw, dh) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < dh) {
            var x = 0
            while (x < dw) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = dw.toLong * dh
          ImageDims(id, dw.toLong, dh.toLong, sr / n, sg / n, sb / n)
        }
      }
  }

  /** Real WAV decode through the JDK: synthetic integer sawtooth signals
    * (length/frequency derived from doc_id — no floating synthesis, so
    * every sample is an exact int16) are encoded to WAV containers and
    * decoded back INSIDE one partition pass; output is what the DECODER
    * observed (rate, length, peak, integer mean |amplitude|). PCM is
    * lossless, so the oracle predicts these from the synthesis rule —
    * a green row proves the container round-trip bit-exact. Same
    * partition-wise batch shape as [[imageDims]]; swapping the synthetic
    * source for lake-read payload bytes changes nothing structural. */
  def audioStats(spark: SparkSession, docs: DataFrame): Dataset[AudioStats] = {
    import spark.implicits._
    val rate = 8000
    docs.select(col("doc_id"),
        (lit(800) + pmod(col("doc_id"), lit(100))).cast(IntegerType).as("n"),
        (lit(1) + pmod(col("doc_id"), lit(7))).cast(IntegerType).as("f"))
      .as[(Long, Int, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, n, f) =>
          val samples = Array.tabulate(n)(i => (((i * f) % 256 - 128) * 256).toShort)
          val (decRate, dec) = WavCodec.decode(WavCodec.encode(rate, samples))
          var (peak, sumAbs) = (0L, 0L)
          var i = 0
          while (i < dec.length) {
            val a = math.abs(dec(i).toLong)
            if (a > peak) peak = a
            sumAbs += a
            i += 1
          }
          AudioStats(id, decRate.toLong, dec.length.toLong, peak,
            sumAbs / dec.length)
        }
      }
  }

  /** Perceptual AUDIO fingerprint + dedup — the Chromaprint-style energy
    * signature over the REAL WAV round-trip ([[audioStats]]'s decode
    * path): the decoded |PCM| stream splits into 8 equal time bands, bit
    * b fires when band b's energy exceeds the mean band energy
    * (integer-only: 8·e_b > Σe), and the 8-bit fingerprint groups
    * near-identical recordings — re-encodes of the same signal collapse
    * onto one fingerprint regardless of container. Cluster id is the
    * min doc_id sharing the fingerprint (the [[imageDedup]] keep rule).
    * Same partition-wise decode batch shape as [[audioStats]]; the
    * grouping is one fingerprint-keyed exchange over (doc, fp) rows —
    * at 100 TB the decode dominates and parallelizes embarrassingly.
    * Output: (doc_id, fp, cluster_id). */
  def audioDedup(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val rate = 8000
    val fps = docs.select(col("doc_id"),
        (lit(800) + pmod(col("doc_id"), lit(100))).cast(IntegerType).as("n"),
        (lit(1) + pmod(col("doc_id"), lit(7))).cast(IntegerType).as("f"))
      .as[(Long, Int, Int)]
      .mapPartitions { batch =>
        batch.map { case (id, n, f) =>
          val samples = Array.tabulate(n)(i => (((i * f) % 256 - 128) * 256).toShort)
          val (_, dec) = WavCodec.decode(WavCodec.encode(rate, samples))
          val e = new Array[Long](8)
          var i = 0
          while (i < dec.length) {
            e((i * 8 / dec.length).min(7)) += math.abs(dec(i).toLong)
            i += 1
          }
          val total = e.sum
          var fp = 0L
          var b = 0
          while (b < 8) { if (8L * e(b) > total) fp |= (1L << b); b += 1 }
          AudioHash(id, fp)
        }
      }.toDF()
    fps.join(fps.groupBy(col("fp")).agg(min(col("doc_id")).as("cluster_id")), "fp")
      .select(col("doc_id"), col("fp"), col("cluster_id"))
  }
}
