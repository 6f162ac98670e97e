package graft.app

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession

/** One-off audit: q_ngram_jaccard with the hot-shingle cap must be
  * output-identical to the uncapped run (pairs at J>=0.8 always share rare
  * shingles too), while cutting the candidate volume. Run per sfDir. */
object CapCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- args) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      def run(cap: Long): (Long, Double, org.apache.spark.sql.DataFrame) = {
        val t0 = System.nanoTime()
        val df = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.8, maxShingleDf = cap)
        val n = df.count()
        (n, (System.nanoTime() - t0) / 1e9, df)
      }
      val (n0, t0, d0) = run(0L)
      val (n1, t1, d1) = run(50L)
      val missing = d0.exceptAll(d1).count()
      val spurious = d1.exceptAll(d0).count()
      println(f"[capcheck] $sf uncapped=$n0 (${t0}%.1f s) capped=$n1 (${t1}%.1f s) missing=$missing spurious=$spurious")
    }
    spark.stop()
  }
}
