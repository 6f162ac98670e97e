package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components / union-find over DataFrames — iterative min-label
  * propagation to fixpoint (the union-find named in BASELINE.json
  * north_rule; reference semantics: transitive closure of the fuzzy-match
  * graph, eschergraph/tools/fuzzy_matcher.py:79-131).
  *
  * Input: `vertices(key, v)` and undirected `edges(key, a, b)`; `key`
  * scopes independent graphs (here: doc_id), so labels never cross keys
  * and the shuffle partitioning by (key, vertex) is skew-free even when
  * one entity name is globally hot.
  *
  * Each iteration propagates the minimum label one hop and
  * `localCheckpoint`s to truncate lineage; convergence is detected via a
  * changed-row count. Iterations are bounded by component diameter —
  * alias clusters and per-doc relation graphs are shallow, so this
  * converges in a handful of rounds regardless of corpus size. (At truly
  * adversarial diameters, swap in large-star/small-star with the same
  * contract.)
  */
object ConnectedComponents {

  /** Returns (key, v, component) with component = min label (string order)
    * over the vertex's component. */
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // adjacency in both directions, deduped
    val adj = edges.select(col("key"), col("a"), col("b"))
      .union(edges.select(col("key"), col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)

    var labels = vertices.select(col("key"), col("v"), col("v").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = adj
        .join(labels, adj("key") === labels("key") && adj("a") === labels("v"))
        .groupBy(adj("key").as("nk"), adj("b").as("nv"))
        .agg(min(col("label")).as("nbr_label"))
      val updated = labels
        .join(nbrMin, labels("key") === col("nk") && labels("v") === col("nv"), "left")
        .select(
          labels("key"),
          labels("v"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("new_label"),
          (col("nbr_label").isNotNull && col("nbr_label") < col("label")).as("changed"))
      val cp = updated.localCheckpoint(true)
      val changed = cp.filter(col("changed")).limit(1).count()
      labels = cp.select(col("key"), col("v"), col("new_label").as("label"))
      converged = changed == 0L
      iter += 1
    }
    labels.withColumnRenamed("label", "component")
  }
}
