package graft.ops

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against a full corpus scan: one narrow pass, no corpus shuffle,
  * top-k per query via window over the (queries x corpus) score stream.
  * Scale path: random-hyperplane LSH bucketing — corpus coded once,
  * queries multi-probed (own bucket + Hamming-1 buckets), exact cosine
  * only inside candidate buckets; corpus scan cost drops to the probed
  * buckets' share. IVF-style variants slot in by replacing the code
  * function with a centroid assignment.
  */
object Similarity {

  private val cosUdf = udf((a: Seq[Float], b: Seq[Float]) =>
    TextFns.cosine(a.toArray, b.toArray))

  /** Exact top-k neighbors for each query (excluding self-matches by id).
    * Output: (qid, id, cosine, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("id"), col("vec").as("cv"))
    val q = queries.select(col("id").as("qid"), col("vec").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine", round(cosUdf(col("qv"), col("cv")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }

  /** LSH-bucketed ANN top-k: candidates from the query's code bucket plus
    * all Hamming-distance-1 buckets, exact cosine + top-k among them. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 8, dim: Int = 64, seed: Long = 7L): DataFrame = {
    val planes: Array[Array[Double]] = {
      val rng = new scala.util.Random(seed)
      Array.fill(bits, dim)(rng.nextGaussian())
    }
    val codeUdf = udf((v: Seq[Float]) => {
      var code = 0
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        val n = math.min(dim, v.length)
        while (i < n) { dot += planes(b)(i) * v(i); i += 1 }
        if (dot > 0) code |= (1 << b)
        b += 1
      }
      code
    })
    val probeUdf = udf((c: Int) => (Seq(c) ++ (0 until bits).map(b => c ^ (1 << b))).toArray)
    val c = corpus.select(col("id"), col("vec").as("cv"))
      .withColumn("bkt", codeUdf(col("cv")))
    val q = queries.select(col("id").as("qid"), col("vec").as("qv"))
      .withColumn("probe", explode(probeUdf(codeUdf(col("qv")))))
    val scored = c.join(broadcast(q), col("bkt") === col("probe"))
      .filter(col("id") =!= col("qid"))
      .withColumn("cosine", round(cosUdf(col("qv"), col("cv")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }
}
