package graft.app

import graft.core.{Corpus, Sessions}
import graft.extract.DeterministicExtractor
import graft.pipeline.BuildPipeline

/** Determinism audit: build the KG at a given parallelism and dump the
  * triples table, so two runs (different cluster sizes / JVM layouts) can
  * be diffed row-by-row. The BASELINE contract requires byte-identical
  * results at N and 4N — `count()` equality is necessary but this is the
  * sufficient check.
  *
  * Usage: TriplesDump <local[n] | spark://...,totalCores> <nDocs> <outParquet>
  */
object TriplesDump {
  def main(args: Array[String]): Unit = {
    val master = args(0)
    val nDocs = args(1).toLong
    val out = args(2)
    val spark =
      if (master.startsWith("spark://")) {
        val Array(url, cores) = master.split(",")
        Sessions.cluster(url, cores.toInt, execCores = 8, execHeapGb = 10, "graft-triples-dump")
      } else Sessions.local(master.stripPrefix("local[").stripSuffix("]").toInt, "graft-triples-dump")
    val r = BuildPipeline.run(Corpus.docs(spark, nDocs), new DeterministicExtractor)
    r.triples.coalesce(1).sortWithinPartitions("doc_id", "subj", "pred", "obj")
      .write.mode("overwrite").parquet(out)
    println(s"[triples-dump] rows=${spark.read.parquet(out).count()} -> $out")
    spark.stop()
  }
}
