package graft.app

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** One-off timer for individual SparkEntry queries — the iteration loop
  * for plan tuning (Bench runs the whole suite; this runs just the named
  * queries). Usage: runMain graft.app.QTime <sfDir> <query> [query ...] */
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-qtime").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val fn = SparkEntry.queries(q)
      // warm the reader/catalyst paths once at tiny scale? No — time cold,
      // same as Bench: one action, count() to drain the plan
      val t0 = System.nanoTime()
      val n = fn(spark, args(0)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[qtime] $q%-20s ${sec}%8.3f s  rows=$n")
    }
    spark.stop()
  }
}
