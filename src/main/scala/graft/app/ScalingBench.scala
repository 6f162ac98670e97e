package graft.app

import graft.core.Corpus
import graft.extract.DeterministicExtractor
import graft.pipeline.BuildPipeline
import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for BASELINE.json north_rule: no real
  * cluster exists in this sandbox, so the N vs 4N executor criterion is
  * proxied by running the *identical* end-to-end KG build at local[8] and
  * local[32] on the same seeded input (BASELINE.md documents the proxy).
  * Prints throughput at both levels + efficiency = T(32) / (4 * T(8)) and
  * appends a row to BENCH/BASELINE.md when given a path.
  *
  * Usage: ScalingBench [nDocs] [outFile]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 3000L
    val out = if (args.length > 1) Some(args(1)) else None

    def runAt(cores: Int): (Double, Long) = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-scaling-$cores")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val t0 = System.nanoTime()
      val triples = BuildPipeline
        .run(Corpus.docs(spark, nDocs), new DeterministicExtractor)
        .triples.count()
      val secs = (System.nanoTime() - t0) / 1e9
      spark.stop()
      // allow a fresh context for the next level
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      (secs, triples)
    }

    val (t8, n8) = runAt(8)
    val (t32, n32) = runAt(32)
    require(n8 == n32, s"triple counts differ across parallelism: $n8 vs $n32")
    val thr8 = nDocs / t8
    val thr32 = nDocs / t32
    val eff = thr32 / (4.0 * thr8)
    val line =
      f"| $nDocs | local[8]: $t8%.1fs ($thr8%.1f docs/s) | local[32]: $t32%.1fs ($thr32%.1f docs/s) | $eff%.2f |"
    println(s"[scaling] docs=$nDocs triples=$n8")
    println(f"[scaling] local[8]=$t8%.1fs  local[32]=$t32%.1fs  speedup=${t8 / t32}%.2fx  efficiency=$eff%.2f")
    println(line)
    out.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p), (line + "\n").getBytes,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    }
  }
}
