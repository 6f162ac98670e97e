package graft.app

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Measures the IVF ANN recall@k curve over nProbe against brute force —
  * the measurement behind ivfTopK's default operating point and the
  * documented curve in its scaladoc.
  *
  * Usage: IvfCurve [sfDir] [k] [nLists]
  */
object IvfCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = if (args.length > 1) args(1).toInt else 5
    val nLists = if (args.length > 2) args(2).toInt else 16
    val spark = graft.core.Sessions.local(16, "graft-ivf-curve")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
    val queries = emb.filter(col("id") < 50)
    val bf = Similarity.bruteForceTopK(emb, queries, k)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (nProbe <- Seq(2, 4, 6, 8, 10, 12, 16)) {
      val t0 = System.nanoTime()
      val ann = Similarity.ivfTopK(emb, queries, k, nLists = nLists, nProbe = nProbe)
        .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = (bf intersect ann).size.toDouble / bf.size
      println(f"[ivf-curve] nLists=$nLists nProbe=$nProbe recall@$k=$recall%.3f " +
        f"scanned=${nProbe * 100.0 / nLists}%.0f%% wall=$secs%.1fs")
    }
    spark.stop()
  }
}
