package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata structs, exactly as a 100 TB
  * training-data pipeline would carry them next to text. The *decode* step
  * (an image/audio codec) is STUBBED with a deterministic fake — the codec
  * libraries are not in this container — but the Spark-side contract is
  * real and tested: schema, per-batch processing shape (mapPartitions over
  * a typed Dataset, the Scala analog of Python's mapInPandas batching),
  * partition sizing, and the feature-extraction output schema.
  */
object Multimodal {

  case class MediaRow(media_id: String, kind: String, payload: Array[Byte],
                      width: Int, height: Int, format: String)
  case class MediaFeatures(media_id: String, kind: String, n_bytes: Int,
                           width: Int, height: Int, checksum: Long,
                           features: Array[Float])

  /** Manufacture deterministic binary payloads from a media_ref column —
    * the stand-in for reading real blobs from object storage. Every
    * derived field (byte count, the LCG byte stream, width/height) seeds
    * from the engine's own fnv1a64 of the ref — pure mod-2^64 arithmetic
    * with a DuckDB twin (HUGEINT), so the media queries are externally
    * replayable end-to-end (Spark's Murmur3 `hash()` has no SQL twin). */
  def payloadFromRef(df: DataFrame, refCol: String): DataFrame = {
    val gen = udf((ref: String) => {
      // deterministic pseudo-bytes: FNV stream seeded by the ref
      var h = graft.functions.TextFns.fnv1a64(ref)
      // low-63-bit mask, NOT math.abs: abs(Long.MinValue) is negative,
      // which would yield a negative byte count / width, and the DuckDB
      // twin's abs(BIGINT) errors on that value — the mask is total and
      // has the exact HUGEINT twin `fnv % 2^63`
      val a = h & Long.MaxValue
      val n = 64 + (a % 192).toInt
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { h = h * 6364136223846793005L + 1442695040888963407L; out(i) = (h >>> 56).toByte; i += 1 }
      (out, (a % 1920 + 64).toInt, ((a / 7) % 1080 + 64).toInt)
    })
    df.withColumn("_gen", gen(col(refCol)))
      .withColumn("payload", col("_gen._1"))
      .withColumn("width", col("_gen._2"))
      .withColumn("height", col("_gen._3"))
      .drop("_gen")
      .withColumn("kind", when(col(refCol).contains("fig"), "image").otherwise("table_render"))
      .withColumn("format", lit("png"))
  }

  /** STUB decode/feature-extract: in production this calls the codec; here
    * it derives a deterministic 8-dim feature vector from the payload so
    * the batching, schema, and downstream joins are fully exercised.
    * Runs as mapPartitions over the typed Dataset — one JVM-side batch per
    * partition, the same execution shape a vectorized (Arrow) UDF has. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        // ??? <- real codec call goes here (image decode / resample);
        // deterministic fake features keep the contract testable offline.
        var cs = 0xcbf29ce484222325L
        var i = 0
        while (i < m.payload.length) { cs ^= m.payload(i); cs *= 0x100000001b3L; i += 1 }
        val f = new Array[Float](8)
        var b = 0
        while (b < 8) { f(b) = ((cs >>> (b * 8)) & 0xff).toFloat / 255f; b += 1 }
        MediaFeatures(m.media_id, m.kind, m.payload.length, m.width, m.height, cs, f)
      }
    }
  }

  /** Resize planning — the pure aspect-fit math a distributed image-resize
    * stage runs BEFORE touching pixels (the codec apply step is the same
    * stub seam as [[extractFeatures]]): scale to fit maxW×maxH, never
    * upscale, floor to integer pixels with a 1-px floor. Pure codegen
    * column math → a q_resize_plan DuckDB oracle checks it exactly. */
  def resizePlan(w: Column, h: Column, maxW: Int, maxH: Int): Column = {
    val s = least(lit(maxW.toDouble) / w, lit(maxH.toDouble) / h, lit(1.0))
    struct(greatest(lit(1L), floor(w * s).cast("long")).as("out_w"),
      greatest(lit(1L), floor(h * s).cast("long")).as("out_h"))
  }

  /** Frame sampling for video-kind media: one output row per sampled
    * frame, `everyNth` stride over the frame index space (frame count
    * derived from payload size at `bytesPerFrame`; a real decoder would
    * read the container header — same stub seam). explode() keeps the
    * fan-out inside the scan projection: no shuffle, and at 100 TB the
    * frame rows inherit the parent's partitioning. */
  def frameSample(media: DataFrame, everyNth: Int, bytesPerFrame: Int = 32): DataFrame = {
    require(everyNth >= 1 && bytesPerFrame >= 1)
    val nFrames = floor(length(col("payload")) / bytesPerFrame).cast("long")
    media.withColumn("frame_idx",
        explode(when(nFrames > 0,
          sequence(lit(0L), nFrames - 1, lit(everyNth.toLong))).otherwise(
          array().cast("array<long>"))))
      .withColumn("frame_off", col("frame_idx") * bytesPerFrame)
      .withColumn("frame_bytes",
        col("payload").substr((col("frame_idx") * bytesPerFrame + 1).cast("int"),
          lit(bytesPerFrame)))
  }
}
