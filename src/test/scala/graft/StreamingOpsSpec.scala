package graft

import graft.ops.TextAnalysis
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stateful streaming curation ops: cross-batch dedup state and
  * event-time windowed aggregation with watermark eviction. */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("dedupStream: first batch wins across micro-batches, min id within a batch") {
    val base = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val inDir = s"$base/in"
    // one file per wave + maxFilesPerTrigger=1 → three ordered micro-batches.
    // 'dup' appears in waves 1 (ids 10, 7) and 2 (id 1): the survivor must
    // be id 7 (batch-min of the FIRST batch), not the global min 1.
    Seq((10L, "dup text"), (7L, "dup  TEXT"), (8L, "unique one"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    Seq((1L, "DUP text"), (2L, "unique two"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)
    Seq((3L, "unique two"), (4L, "unique three"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(inDir)

    val in = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = StreamingOps.dedupStream(in, "doc_id", "text").toDF("fp", "id")
      .writeStream.format("memory").queryName("sdedup_t")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) === 3,
      "expected three data micro-batches")

    val got = spark.table("sdedup_t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fpOf = Map(
      "dup" -> "dup text", "u1" -> "unique one",
      "u2" -> "unique two", "u3" -> "unique three"
    ).map { case (k, txt) =>
      k -> TextAnalysis.fingerprint(Seq((0L, txt)).toDF("doc_id", "text"), "doc_id", "text")
        .collect().head.getString(1)
    }
    assert(got.size === 4)
    assert(got(fpOf("dup")) === 7L) // first-writer batch, min id within it
    assert(got(fpOf("u1")) === 8L)
    assert(got(fpOf("u2")) === 2L) // wave-2 copy beats wave-3 copy
    assert(got(fpOf("u3")) === 4L)
  }

  test("windowStatsOnce equals the batch replay on the fixture corpus") {
    val path = s"$sf/documents.parquet"
    val got = StreamingOps.windowStatsOnce(spark, path)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val batch = spark.read.parquet(path)
      .withColumn("win_start", (col("doc_id") * 60).cast("long").divide(3600).cast("long") * 3600)
      .withColumn("n_tokens",
        graft.functions.TextFns.estimateTokensCol(col("text")).cast("long"))
      .groupBy("win_start", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("sourceWindowStats in append mode: watermark finalizes only closed windows") {
    val base = java.nio.file.Files.createTempDirectory("graft-swin").toString
    val inDir = s"$base/in"
    // wave 1: hour-0 events; wave 2: hour-10 events. After the final
    // no-data flush batch the watermark sits at (hour-10 max - 10 min),
    // so the hour-0 window is finalized and emitted; hour-10 is not.
    Seq((0L, "srcA"), (10L, "srcA"), (20L, "srcB"))
      .toDF("minute", "source").coalesce(1).write.mode("append").parquet(inDir)
    Seq((600L, "srcA"), (610L, "srcB"))
      .toDF("minute", "source").coalesce(1).write.mode("append").parquet(inDir)

    val in = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
      .withColumn("ts", timestamp_seconds(col("minute") * 60))
      .withColumn("n_tokens", lit(1L))
    val q = StreamingOps.sourceWindowStats(in, "ts", "source")
      .select(col("win_start").cast("long").as("s"), col("source"),
        col("n_docs"))
      .writeStream.format("memory").queryName("swin_t")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("swin_t")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map((0L, "srcA") -> 2L, (0L, "srcB") -> 1L),
      s"only the closed hour-0 windows should be emitted, got $got")
  }
}
