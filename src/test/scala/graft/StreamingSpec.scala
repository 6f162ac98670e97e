package graft

import graft.core.Corpus
import graft.extract.DeterministicExtractor
import graft.io.ParquetTableIO
import graft.pipeline.BuildPipeline
import graft.streaming.StreamingBuild
import org.apache.spark.sql.functions._

/** Streaming ingestion: the union of per-micro-batch builds must equal the
  * one-shot batch build of the same documents (per-document semantics make
  * micro-batches self-contained). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streamed build (two waves) equals the batch build of all docs") {
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val inDir = s"$base/in"
    val outDir = s"$base/out"
    val cpDir = s"$base/cp"

    // wave 1: docs 0..19, wave 2: docs 20..39 (whole docs per file)
    val all = Corpus.docs(spark, 40)
    all.filter(col("doc_id") < "doc-00000020")
      .write.mode("append").parquet(inDir)

    val io = new ParquetTableIO(outDir)
    val q1 = StreamingBuild.start(
      StreamingBuild.readDocs(spark, inDir), new DeterministicExtractor, io, cpDir)
    q1.awaitTermination()

    all.filter(col("doc_id") >= "doc-00000020")
      .write.mode("append").parquet(inDir)
    val q2 = StreamingBuild.start(
      StreamingBuild.readDocs(spark, inDir), new DeterministicExtractor, io, cpDir)
    q2.awaitTermination()

    val streamed = io.read(spark, "triples")
      .select("doc_id", "subj", "pred", "obj").distinct()
    val batch = BuildPipeline.run(all, new DeterministicExtractor)
      .triples.select("doc_id", "subj", "pred", "obj").distinct()
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    // the offset log prevents reprocessing: wave-1 docs appear in exactly one batch
    val batchesPerDoc = io.read(spark, "triples")
      .select("doc_id", "_batch_id").distinct()
      .groupBy("doc_id").count().agg(max("count")).head().getLong(0)
    assert(batchesPerDoc === 1L)
  }

  test("replayed micro-batch is a no-op: appendBatch overwrites its own partition") {
    val base = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val io = new ParquetTableIO(base)
    val docs = Corpus.docs(spark, 8)
    val r = BuildPipeline.run(docs, new DeterministicExtractor)

    io.appendBatch(r.triples, "triples", batchId = 0L)
    val afterFirst = io.read(spark, "triples").count()
    // crash-replay of the SAME batch (e.g. after a failure between the six
    // per-table writes): must not duplicate rows
    io.appendBatch(r.triples, "triples", batchId = 0L)
    assert(io.read(spark, "triples").count() === afterFirst)

    // a genuinely new batch still appends
    io.appendBatch(r.triples, "triples", batchId = 1L)
    assert(io.read(spark, "triples").count() === 2 * afterFirst)
    // and replaying batch 1 leaves batch 0 untouched
    io.appendBatch(r.triples, "triples", batchId = 1L)
    assert(io.read(spark, "triples").count() === 2 * afterFirst)
    assert(io.read(spark, "triples").select("_batch_id").distinct().count() === 2)
  }
}
