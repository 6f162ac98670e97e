package graft.materialize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document entity catalog — the engine's one corpus-global
  * aggregation, and the place where entity-name skew is real: "celebrity"
  * entities appear in a large fraction of all documents (the synthetic
  * corpus plants them in ~35%), so grouping by canonical name pushes
  * O(corpus) rows at a handful of keys. Counting aggregates are safe
  * (map-side partial aggregation already spreads them), but the
  * set-valued columns (sample doc ids, surface forms) have no partial
  * reduction — a naive single-phase groupBy ships every value of a hot
  * key to one task.
  *
  * So the rollup is **two-phase with salted repartitioning** (the salting
  * named in BASELINE.json north_rule): phase 1 groups by
  * (name_norm, salt = pmod(hash(doc_id), S)) and reduces each salt
  * lane to bounded partials (counts + capped sorted samples); phase 2
  * merges the ≤ S bounded partials per name. The heaviest key now costs
  * O(values/S) per task in phase 1 and O(S · cap) in phase 2, independent
  * of corpus size.
  *
  * (Per-document stages never need this: their keys carry doc_id, which
  * bounds any key's row count by document size — see Linker/GraphTables
  * scaladocs. The catalog is the stage where that protection ends.)
  */
object GlobalCatalog {

  val DefaultSalts = 32
  val SampleCap = 8

  /** Catalog over the level-0 nodes table:
    * (name_norm, display, n_docs, n_mentions, sample_doc_ids).
    * `n_mentions` counts provenance entries (chunk-level mentions). */
  def entityCatalog(nodes: DataFrame, salts: Int = DefaultSalts): DataFrame = {
    val level0 = nodes.filter(col("level") === 0)
      .select(
        lower(trim(col("name"))).as("name_norm"),
        col("name").as("display"),
        element_at(col("metadata"), 1).getField("document_id").as("doc_id"),
        size(col("metadata")).cast("long").as("n_mentions"))

    // phase 1: salted partials — bounded output per (name, salt)
    val partials = level0
      .withColumn("salt", pmod(hash(col("doc_id")), lit(salts)))
      .groupBy(col("name_norm"), col("salt"))
      .agg(
        min(col("display")).as("display"),
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_mentions")).as("n_mentions"),
        slice(array_sort(collect_set(col("doc_id"))), 1, SampleCap).as("sample"))

    // phase 2: merge <= `salts` bounded partials per name
    partials
      .groupBy(col("name_norm"))
      .agg(
        min(col("display")).as("display"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_mentions")).as("n_mentions"),
        slice(array_sort(array_distinct(flatten(collect_list(col("sample"))))), 1, SampleCap)
          .as("sample_doc_ids"))
  }

  /** Single-phase reference implementation (hot keys unprotected) — used
    * by the spec to prove the salted rollup is semantics-preserving. */
  def entityCatalogNaive(nodes: DataFrame): DataFrame = {
    nodes.filter(col("level") === 0)
      .select(
        lower(trim(col("name"))).as("name_norm"),
        col("name").as("display"),
        element_at(col("metadata"), 1).getField("document_id").as("doc_id"),
        size(col("metadata")).cast("long").as("n_mentions"))
      .groupBy(col("name_norm"))
      .agg(
        min(col("display")).as("display"),
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_mentions")).as("n_mentions"),
        slice(array_sort(collect_set(col("doc_id"))), 1, SampleCap).as("sample_doc_ids"))
  }
}
