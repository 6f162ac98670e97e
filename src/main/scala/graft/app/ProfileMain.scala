package graft.app

import graft.core.Corpus
import graft.extract.DeterministicExtractor
import graft.pipeline.BuildPipeline
import org.apache.spark.sql.SparkSession

/** Per-stage profiling at a given core count (GRAFT_STAGE_TIMING=1 to see
  * stage walls on stderr). Usage: ProfileMain [nDocs] [cores] */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 6000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = graft.core.Sessions.local(cores, s"graft-profile-$cores")
    val t0 = System.nanoTime()
    val n = BuildPipeline.run(Corpus.docs(spark, nDocs), new DeterministicExtractor).triples.count()
    println(f"[profile] cores=$cores docs=$nDocs triples=$n total=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
