package graft.app

import graft.core.{Corpus, Sessions}
import graft.extract.{DeterministicExtractor, Extract}
import graft.link.Linker
import org.apache.spark.sql.functions._

/** Determinism audit for the chunk → extract → link chain in isolation:
  * build each stage on the seeded corpus and dump sorted digests of every
  * level (chunks, logs, unique names, mapping), so two runs under
  * different cluster layouts diff stage-by-stage to localize where
  * results diverge.
  *
  * Usage: MappingDump <local[n] | spark://...,totalCores> <nDocs> <outDir>
  */
object MappingDump {
  def main(args: Array[String]): Unit = {
    val master = args(0)
    val nDocs = args(1).toLong
    val out = args(2)
    val spark =
      if (master.startsWith("spark://")) {
        val Array(url, cores) = master.split(",")
        Sessions.cluster(url, cores.toInt, execCores = 8, execHeapGb = 10, "graft-mapping-dump")
      } else Sessions.local(master.stripPrefix("local[").stripSuffix("]").toInt, "graft-mapping-dump")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = Corpus.docs(spark, nDocs)
    val extractor = new DeterministicExtractor
    val chunks = graft.build.Chunker.chunks(docs)
    val raw = Extract.rawLogs(chunks, graft.build.Chunker.visualSpans(docs), extractor)
    val logs = Extract.withProperties(raw, extractor)
    val agg = Linker.mentionAgg(logs)
    val names = Linker.uniqueNamesFrom(agg)
    val mapping = Linker.canonicalMapping(logs)

    def dump(name: String, df: org.apache.spark.sql.DataFrame, sortCols: Seq[String]): Unit = {
      df.coalesce(1).sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("overwrite").parquet(s"$out/$name")
      println(s"[mapping-dump] $name rows=${spark.read.parquet(s"$out/$name").count()}")
    }
    dump("chunks", chunks.toDF()
      .select(col("doc_id"), col("chunk_id"), md5(col("text")).as("h")),
      Seq("doc_id", "chunk_id"))
    dump("logs", logs.toDF()
      .select(col("doc_id"), col("chunk_id"),
        md5(to_json(struct(col("nodes"), col("edges"), col("properties")))).as("h")),
      Seq("doc_id", "chunk_id"))
    dump("names", names
      .select(col("doc_id"), col("name_norm"), col("display"), md5(col("descs")).as("h")),
      Seq("doc_id", "name_norm"))
    val pairs = Linker.matchedPairs(names)
    dump("pairs", pairs, Seq("doc_id", "a", "b"))
    val comps = graft.link.ConnectedComponents.runPerKey(
      names.select(col("doc_id").as("key"), col("name_norm").as("v")),
      pairs.select(col("doc_id").as("key"), col("a"), col("b")))
    dump("comps", comps, Seq("key", "v"))
    dump("mapping", mapping, Seq("doc_id", "chunk_id", "name_norm"))
    spark.stop()
  }
}
