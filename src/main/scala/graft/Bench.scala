package graft

import graft.core.Corpus
import graft.extract.DeterministicExtractor
import graft.pipeline.BuildPipeline
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline = full KG build (docs/sec, triples/sec)
  * on the synthetic interleaved corpus sized by the sf dir, plus the
  * heavy training-data operators on the sf-dir parquet tables.
  * Prints exactly one JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    def timed(name: String)(body: => Long): Long = {
      val t0 = System.nanoTime()
      val n = try body catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      results(name) = (System.nanoTime() - t0) / 1e9
      n
    }

    // headline: fresh end-to-end KG build
    val nDocs = Corpus.docsForSfDir(sfDir)
    val nTriples = timed("kg_build_e2e") {
      BuildPipeline.run(Corpus.docs(spark, nDocs), new DeterministicExtractor).triples.count()
    }
    val kgSecs = results("kg_build_e2e")

    // heavy operators on the sf-dir tables
    val heavy = Seq("q_ngram_jaccard", "q_minhash_lsh", "q_simhash", "q_embed_neardup",
      "q_dedup_clusters", "q_cosine_topk", "q_ann_lsh", "q_ann_ivf", "q_quality",
      "q_exact_dedup", "q_agg_pricing", "q_join_agg")
    heavy.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        timed(name)(fn(spark, sfDir).count())
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    val extra = f""""kg_docs":$nDocs,"kg_triples":$nTriples,"kg_docs_per_sec":${nDocs / kgSecs}%.2f,"kg_triples_per_sec":${nTriples / kgSecs}%.2f"""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,$extra%s,"sf":"$sfDir%s"}""")
    spark.stop()
  }
}
