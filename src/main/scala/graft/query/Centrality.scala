package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Node-centrality analytics over the materialized graph (edges table with
  * (frm, to) endpoint ids — materialize/GraphTables.scala). The dashboard's
  * degree stats (GraphOps.stats) answer "most connected"; PageRank answers
  * "most structurally important", the ranking a KG consumer wants when
  * picking seed entities for community summaries or curriculum ordering.
  */
object Centrality {

  /** Power-iteration PageRank with uniform teleport and dangling-mass
    * redistribution, fixed iteration count (the classic
    * Brin/Page formulation; damping d, rank mass conserved at 1.0):
    *
    * r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + dangling/N)
    *
    * Expressed as iterative DataFrame self-joins per BASELINE.json's
    * canonicalization idiom — no RDD, no GraphX:
    *  - vertices and out-degrees are computed once and cached; the per-
    *    iteration work is one (frm)-keyed equi-join + one (to)-keyed
    *    partial-agg sum, both hash shuffles on the same keys every
    *    iteration, so AQE reuses shuffle-partition sizing and a real
    *    cluster co-locates them.
    *  - the dangling-node mass (rank parked on zero-outdegree vertices) is
    *    a one-row aggregate CROSS-JOIN-broadcast back into the update —
    *    never a driver-side collect, so the whole iteration stays on the
    *    executors.
    *  - each iteration ends in an EAGER localCheckpoint: plans stay O(1)
    *    deep instead of O(iterations), which is what keeps driver planning
    *    time flat when the edge table has millions of partitions. (On a
    *    durable cluster run, set a checkpoint dir and swap for
    *    `checkpoint()` — same semantics, replica-backed.)
    *
    * High-degree hubs are exactly the rows AQE skew-splits on the (to)
    * aggregation; the (frm) join side is pre-divided by outdeg so hot
    * sources fan out value-free. Returns (id, rank) with rank rounded to
    * 6 decimals; ranks over all vertices sum to 1. */
  def pageRank(edges: DataFrame, frmCol: String = "frm", toCol: String = "to",
               iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val spark = edges.sparkSession
    val e = edges.select(col(frmCol).as("src"), col(toCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    val n = vertices.count()
    if (n == 0) return spark.emptyDataFrame
      .withColumn("id", lit(null).cast("string"))
      .withColumn("rank", lit(null).cast("double"))
    val outDeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    // (id, deg) for every vertex; deg null => dangling
    val withDeg = vertices.join(outDeg, Seq("id"), "left").localCheckpoint(true)
    var ranks = withDeg.select(col("id"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    val base = (1.0 - damping) / n
    for (_ <- 1 to iterations) {
      val cur = ranks.join(withDeg.select("id", "deg"), Seq("id"))
      val dangling = cur.agg(
        coalesce(sum(when(col("deg").isNull, col("rank"))), lit(0.0)).as("_dm"))
      val contribs = cur.filter(col("deg").isNotNull)
        .join(e, cur("id") === e("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("inflow"))
      ranks = withDeg.select("id")
        .join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit(base) + lit(damping) *
            (coalesce(col("inflow"), lit(0.0)) + col("_dm") / n)).as("rank"))
        .localCheckpoint(true)
    }
    ranks.select(col("id"), round(col("rank"), 6).as("rank"))
  }
}
