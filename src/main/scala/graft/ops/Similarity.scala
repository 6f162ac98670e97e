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

  /** Multi-table random-hyperplane codes: for each of `tables` independent
    * plane sets, emit (table, code). Recall compounds across tables:
    * a neighbor missed by one table's bucket is caught by another. */
  private[ops] def codesUdf(tables: Int, bits: Int, dim: Int, seed: Long) = {
    val planes: Array[Array[Array[Double]]] = {
      val rng = new scala.util.Random(seed)
      Array.fill(tables, bits, dim)(rng.nextGaussian())
    }
    udf((v: Seq[Float]) => {
      val out = new Array[Int](tables)
      var t = 0
      while (t < tables) {
        var code = 0
        var b = 0
        while (b < bits) {
          var dot = 0.0
          var i = 0
          val n = math.min(dim, v.length)
          while (i < n) { dot += planes(t)(b)(i) * v(i); i += 1 }
          if (dot > 0) code |= (1 << b)
          b += 1
        }
        out(t) = code
        t += 1
      }
      out
    })
  }

  /** All (table, bucket) cells within Hamming distance 1 of each code. */
  private[ops] def probesUdf(tables: Int, bits: Int) =
    udf((codes: Seq[Int]) =>
      codes.zipWithIndex.flatMap { case (c, t) =>
        (Seq(c) ++ (0 until bits).map(b => c ^ (1 << b))).map(p => t.toLong * 65536L + p)
      }.toArray)

  private[ops] def cellsUdf(tables: Int) =
    udf((codes: Seq[Int]) =>
      codes.zipWithIndex.map { case (c, t) => t.toLong * 65536L + c }.toArray)

  /** IVF (inverted-file) ANN: k-means coarse quantizer trained with a few
    * distributed Lloyd iterations (assignment is a narrow map against the
    * broadcast centroid table; the update step is a posexplode +
    * per-(cluster, dim) average — pure DataFrame aggregation, no driver
    * loops over vectors). Corpus rows are bucketed by nearest centroid;
    * each query probes its `nProbe` nearest lists and scores exact cosine
    * only inside them. At 100 TB the corpus assignment is one pass and the
    * probe join touches nProbe/nLists of the data. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 4, iterations: Int = 3,
              seed: Long = 7L): DataFrame = {
    val c = corpus.select(col("id"), col("vec").as("cv"))

    // init: deterministic hash-sample of nLists corpus vectors
    var centroids: Array[Array[Float]] = c
      .withColumn("h", abs(hash(col("id"), lit(seed))))
      .orderBy(col("h").asc, col("id").asc)
      .limit(nLists)
      .select(col("cv")).collect()
      .map(_.getAs[Seq[Float]](0).toArray)

    def nearestUdf(cents: Array[Array[Float]], n: Int) =
      udf((v: Seq[Float]) => {
        val a = v.toArray
        cents.zipWithIndex
          .map { case (ct, i) => (1.0 - TextFns.cosine(ct, a), i) }
          .sortBy(identity).take(n).map(_._2)
      })

    var it = 0
    while (it < iterations) {
      val cents = centroids
      val assigned = c.withColumn("cluster", nearestUdf(cents, 1)(col("cv"))(0))
      val means = assigned
        .select(col("cluster"), posexplode(col("cv")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("cluster"), col("ps.m").as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getAs[Seq[Double]](1).map(_.toFloat).toArray)
        .toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
      it += 1
    }

    val cents = centroids
    val bucketed = c.withColumn("cluster", nearestUdf(cents, 1)(col("cv"))(0))
    val probed = queries.select(col("id").as("qid"), col("vec").as("qv"))
      .withColumn("cluster", explode(nearestUdf(cents, nProbe)(col("qv"))))
    val scored = bucketed.join(broadcast(probed), Seq("cluster"))
      .filter(col("id") =!= col("qid"))
      .select("qid", "id", "qv", "cv").distinct()
      .withColumn("cosine", round(cosUdf(col("qv"), col("cv")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }

  /** LSH-bucketed ANN top-k: `tables` independent 6-bit hyperplane codes,
    * queries probe their own cell + all Hamming-1 cells per table, exact
    * cosine + top-k among the candidates only. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              tables: Int = 8, bits: Int = 6, dim: Int = 64, seed: Long = 7L): DataFrame = {
    val codes = codesUdf(tables, bits, dim, seed)
    val c = corpus.select(col("id"), col("vec").as("cv"))
      .withColumn("cell", explode(cellsUdf(tables)(codes(col("cv")))))
    val q = queries.select(col("id").as("qid"), col("vec").as("qv"))
      .withColumn("cell", explode(probesUdf(tables, bits)(codes(col("qv")))))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select("qid", "id", "qv", "cv").distinct()
      .withColumn("cosine", round(cosUdf(col("qv"), col("cv")), 4))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "id", "cosine", "rank")
  }
}
