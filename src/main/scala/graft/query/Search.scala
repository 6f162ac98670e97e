package graft.query

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Search entry points (reference eschergraph/graph/search/quick_search.py
  * and global_search.py), as dataflow plans over the search_index table:
  *
  *   quick (local) search: level-0 rows [+ optional document filter] →
  *   embedding-cosine top-40 → deterministic rerank → keep the score-ordered
  *   prefix with relevance > 0.1 (the reference breaks at the first
  *   below-threshold result, quick_search.py:180-209);
  *
  *   global search: level-1 rows → top-15 → rerank threshold 0.
  *
  * The query embedding is computed once on the driver and folded into the
  * plan as a literal, so scoring stays a narrow map over the index scan —
  * no shuffle until the tiny top-k sort.
  */
object Search {

  /** Query-vector cosine as a NATIVE codegen expression: the query
    * embedding folds into the plan as an array<float> literal and
    * [[graft.functions.CosineSim]] scores each index row inside
    * whole-stage codegen — no boxed Seq[Float] UDF on the one scan that
    * touches the full level slice (the per-row cost at 100x index size). */
  private def cosineToQuery(queryVec: Array[Float])(v: org.apache.spark.sql.Column) =
    graft.functions.CosineSim(typedLit(queryVec), v)

  private def rerankUdf(query: String) =
    udf((t: String) => TextFns.rerankScore(query, t))

  /** Shared retrieve→rerank→prefix-filter plan. */
  def retrieve(index: DataFrame, query: String, level: Int, topN: Int,
               threshold: Double, docIds: Seq[String] = Nil): DataFrame = {
    val qv = TextFns.embed(query)
    val base = index.filter(col("level") === level)
    val filtered =
      if (docIds.nonEmpty) base.filter(col("document_id").isin(docIds: _*)) else base
    val hits = filtered
      .withColumn("distance", -cosineToQuery(qv)(col("embedding")))
      .orderBy(col("distance").asc, col("id").asc)
      .limit(topN)
      .withColumn("score", rerankUdf(query)(col("text")))
    // The reference breaks at the first below-threshold score in the
    // score-ordered list (quick_search.py:180-209) — which, BECAUSE the
    // list is score-ordered, is exactly `score > threshold`: no surviving
    // row can be preceded by a below-threshold one, so a windowed
    // prefix-break computation would be dead weight. The rank window is
    // deliberately UNPARTITIONED (Spark warns): it runs over `hits`, which
    // limit(topN) already bounded to <= 40 rows — a single-partition frame
    // is correct and O(topN) at any corpus size.
    val w = Window.orderBy(col("score").desc, col("id").asc)
    hits
      .filter(col("score") > threshold)
      .withColumn("rn", row_number().over(w))
      .select(col("id"), col("text"), col("type"), col("document_id"), col("score"), col("rn"))
  }

  /** Q1 — quick/local search (top_n=40, level 0, threshold 0.1). */
  def quickSearch(index: DataFrame, query: String, docIds: Seq[String] = Nil): DataFrame =
    retrieve(index, query, level = 0, topN = 40, threshold = 0.1, docIds)

  /** Q2 — global search (top_n=15, level 1, threshold 0). */
  def globalSearch(index: DataFrame, query: String, docIds: Seq[String] = Nil): DataFrame =
    retrieve(index, query, level = 1, topN = 15, threshold = 0.0, docIds)

  /** J8 — search-result enrichment (reference quick_search.py:212-244):
    * each hit joins back to its graph row by type; edges additionally
    * resolve endpoint names, properties resolve the owner name (the
    * reference's "parent nodes"). INNER joins with the hit side broadcast:
    * every hit id exists in the table it was indexed from (the index is
    * the union of exactly these tables), and a LEFT join here would defeat
    * the broadcast — Spark cannot build the PRESERVED side of an outer
    * join, so the hint would be silently ignored and each search would
    * shuffle the full nodes/edges/properties tables against <= 40 rows. */
  def enrich(hits: DataFrame, nodes: DataFrame, edges: DataFrame,
             properties: DataFrame): DataFrame = {
    val h = broadcast(hits)
    val names = nodes.select(col("id").as("nid"), col("name"))

    val nodeHits = h.filter(col("type") === "node")
      .join(nodes.select(col("id"), col("name"), col("description"), col("level")), Seq("id"))
      .select(col("id"), col("type"), col("text"), col("score"), col("document_id"),
        col("name").as("subject"), col("description").as("detail"),
        // reference parent_nodes for a node hit = [node.name]
        // (quick_search.py:228-230)
        array(col("name")).as("parent_names"))

    val edgeHits = broadcast(broadcast(h.filter(col("type") === "edge")
      .join(edges.select(col("id"), col("frm"), col("to"), col("description")), Seq("id")))
      .join(names.select(col("nid").as("frm"), col("name").as("frm_name")), Seq("frm")))
      .join(names.select(col("nid").as("to"), col("name").as("to_name")), Seq("to"))
      .select(col("id"), col("type"), col("text"), col("score"), col("document_id"),
        concat_ws(" ↔ ", col("frm_name"), col("to_name")).as("subject"),
        col("description").as("detail"),
        // reference order: [edge.to.name, edge.frm.name] (quick_search.py:236)
        array(col("to_name"), col("frm_name")).as("parent_names"))

    val propHits = broadcast(h.filter(col("type") === "property")
      .join(properties.select(col("id"), col("node_id"), col("description")), Seq("id")))
      .join(names.select(col("nid").as("node_id"), col("name").as("owner_name")), Seq("node_id"))
      .select(col("id"), col("type"), col("text"), col("score"), col("document_id"),
        col("owner_name").as("subject"), col("description").as("detail"),
        array(col("owner_name")).as("parent_names"))

    nodeHits.unionByName(edgeHits).unionByName(propHits)
      .orderBy(col("score").desc, col("id").asc)
  }

  /** Q3 — visuals selection (reference choose_suitable_visuals,
    * quick_search.py:78-114 — defined but dormant there: its call site is
    * commented out "add the visuals in future PR"). Enriched hits whose
    * FIRST provenance entry carries visual metadata contribute their
    * parent names; parents resolved by (document, name) that are
    * `is_visual` level-0 nodes are returned, deduped. The hit set is
    * top-k small → broadcast; the node probe is an equi-join on the
    * doc-scoped name key.
    *
    * "Carries visual metadata" means ANY provenance entry has a visual
    * (reference inspects an arbitrary set member, quick_search.py:100-102);
    * metadata is array_sort'd and visual entries carry the largest
    * chunk_ids, so probing only the FIRST entry would silently exclude
    * every hit that is also mentioned in a normal text chunk. */
  def suitableVisuals(enriched: DataFrame, nodes: DataFrame, edges: DataFrame,
                      properties: DataFrame): DataFrame = {
    val metaOf = nodes.select(col("id"), col("metadata"))
      .unionByName(edges.select(col("id"), col("metadata")))
      .unionByName(properties.select(col("id"), col("metadata")))
    val visualHitParents = broadcast(enriched).join(metaOf, Seq("id"))
      .filter(exists(col("metadata"), m => m.getField("visual").isNotNull))
      .select(col("document_id"),
        explode(col("parent_names")).as("pname"))
      .select(col("document_id"), lower(trim(col("pname"))).as("pname_norm"))
      .distinct()
    val vh = visualHitParents.select(col("document_id").as("vh_doc"),
      col("pname_norm").as("vh_name"))
    // try_element_at, NOT element_at: downstream INNER joins on node_doc /
    // media_ref make Catalyst infer IsNotNull on these expressions and PUSH
    // that predicate below the is_visual filter — under ANSI, element_at
    // would then throw on the empty filtered array of a non-visual node
    // before the is_visual predicate ever prunes it.
    nodes.filter(col("is_visual") && col("level") === 0)
      .withColumn("node_doc", try_element_at(col("metadata"), lit(1)).getField("document_id"))
      .withColumn("media_ref",
        try_element_at(filter(col("metadata"), m => m.getField("visual").isNotNull), lit(1))
          .getField("visual").getField("media_ref"))
      .join(broadcast(vh),
        col("node_doc") === col("vh_doc") && lower(trim(col("name"))) === col("vh_name"))
      .select(col("id"), col("name"), col("description"),
        col("node_doc").as("document_id"), col("media_ref"))
      .distinct()
  }

  /** Visual CONTENT recovery — the reference inlines the table/figure text
    * into provenance (`MetadataVisual.content`, persistence/metadata.py:10-22);
    * our `MetaVisual` deliberately stores only the `media_ref` pointer
    * (core/Schema.scala — inlining would copy the full visual text into
    * every provenance entry at corpus scale). This join closes the loop:
    * [[suitableVisuals]] results recover their text from the spans table by
    * (document_id, media_ref). The visuals side is top-k small → broadcast;
    * the spans scan prunes to media spans only. INNER join: every media_ref
    * in a visual's provenance originates from a span of that document, and
    * a LEFT join would defeat the broadcast (the preserved side of an
    * outer join cannot be the build side). */
  def visualContent(visuals: DataFrame, docs: DataFrame): DataFrame = {
    val spans = docs.select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.media_ref") =!= "")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"),
        col("s.text").as("content"))
    broadcast(visuals).join(spans,
        visuals("document_id") === spans("doc_id") &&
          visuals("media_ref") === spans("media_ref"))
      .select(visuals("id"), visuals("name"), visuals("description"),
        visuals("document_id"), visuals("media_ref"), col("content"))
  }

  case class RagAnswer(answer: String, sources: Seq[String])

  /** L9 stand-in: deterministic answer assembly from the retrieved context
    * (the reference sends the same context to an LLM). */
  def answer(index: DataFrame, query: String): RagAnswer = {
    val rows = quickSearch(index, query).collect()
    val ctx = rows.map(_.getAs[String]("text")).toSeq
    RagAnswer(
      if (ctx.isEmpty) "no relevant context found"
      else s"Based on ${ctx.size} sources: " + ctx.take(3).mkString(" | "),
      rows.map(_.getAs[String]("id")).toSeq)
  }
}
