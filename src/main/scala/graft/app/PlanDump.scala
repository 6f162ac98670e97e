package graft.app

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for named SparkEntry queries to files —
  * the before/after plan evidence for optimization rounds (guide §7.2).
  *
  * Usage: PlanDump <outDir> <suffix> <query> [query ...]
  * Writes <outDir>/<query>_<suffix>.txt per query. Uses the engine session
  * (Sessions.local) so plans match what Bench/Verify actually run.
  *
  * Queries whose DataFrame construction is EAGER (the CC-loop entries:
  * q_dedup_clusters, q_cc_bigstar, q_semantic_dedup, q_curate_pack) show
  * the final consumer plan over their cached stage cuts; the iterative
  * internals are instrumented by GRAFT_STAGE_TIMING / JobCount instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.core.Sessions.local(32, "graft-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.drop(2).foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${q}_$suffix.txt"), plan)
      println(s"[plan-dump] wrote $outDir/${q}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
