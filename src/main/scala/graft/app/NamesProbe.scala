package graft.app

import graft.core.Corpus
import graft.extract.DeterministicExtractor

/** Isolates the linker name-table stage (guide §1.4 noop-sink timing):
  * materializes the logs stage once, then times (a) a bare cached-logs
  * pass, (b) the exploded mention stream, (c) the full slim name rollup —
  * attributing the stage wall between cache read, explode, and shuffle.
  * Usage: NamesProbe [nDocs] [cores]
  */
object NamesProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 6000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = graft.core.Sessions.local(cores, "graft-names-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val chunksT = graft.build.Chunker.chunks(Corpus.docs(spark, nDocs))
    val ex = new DeterministicExtractor
    val logs = graft.core.Materialize.eager(
      graft.extract.Extract.withProperties(
        graft.extract.Extract.rawLogs(chunksT,
          graft.build.Chunker.visualSpans(Corpus.docs(spark, nDocs)), ex), ex).toDF())
    def timed(what: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      // warm + 2 timed reps, noop sink (computes every column)
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[names-probe] $what%-18s best=$best%6.2f s")
    }
    val logsT = logs.as[graft.core.ExtractionLog]
    import org.apache.spark.sql.functions._
    val mr = graft.link.Linker.mentionsRaw(logsT)
    println(s"[names-probe] mention rows = ${mr.count()}")
    timed("logs_cache_scan")(logs)
    timed("mentions_raw")(mr)
    timed("names_rollup")(graft.link.Linker.uniqueNamesSlim(logsT))
    timed("distinct_dn")(mr.select(col("doc_id"), col("name_norm")).distinct())
    timed("groupby_count")(mr.groupBy(col("doc_id"), col("name_norm")).count())
    timed("groupby_doc")(mr.groupBy(col("doc_id")).count())
    val (mcut, mrdd) = graft.core.Materialize.stageCutHandle(mr)
    timed("min_over_cut")(mcut.groupBy(col("doc_id"), col("name_norm"))
      .agg(min(col("display")).as("display")))
    mrdd.unpersist(blocking = false)
    spark.stop()
  }
}
