package graft.app

import graft.core.{Corpus, Sessions}
import graft.extract.DeterministicExtractor
import graft.pipeline.BuildPipeline
import org.apache.spark.sql.functions._

/** Stage-level determinism audit for one document: build the KG and dump
  * every intermediate (logs, mapping, nodes, edges, dropped) filtered to
  * the given doc_id, so runs under different JVM layouts can be diffed
  * stage by stage to localize where results diverge.
  *
  * Usage: DebugDoc <local[n] | spark://...,cores> <nDocs> <doc_id> <outDir>
  */
object DebugDoc {
  def main(args: Array[String]): Unit = {
    val master = args(0); val nDocs = args(1).toLong; val docId = args(2); val out = args(3)
    val spark =
      if (master.startsWith("spark://")) {
        val Array(url, cores) = master.split(",")
        Sessions.cluster(url, cores.toInt, 8, 10, "graft-debug-doc")
      } else Sessions.local(master.stripPrefix("local[").stripSuffix("]").toInt, "graft-debug-doc")
    val r = BuildPipeline.run(Corpus.docs(spark, nDocs), new DeterministicExtractor)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val filtered = if (docId == "ALL") df else df.filter(col("doc_id") === docId)
      filtered.coalesce(1).write.mode("overwrite").json(s"$out/$name")
      println(s"[debug-doc] $name rows=${spark.read.json(s"$out/$name").count()}")
    }
    dump("logs", r.logs)
    dump("mapping", r.mapping)
    dump("triples", r.triples)
    dump("dropped", r.droppedEdges)
    spark.stop()
  }
}
