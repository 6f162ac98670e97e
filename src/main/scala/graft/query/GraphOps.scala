package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-admin operators from SURVEY.md §2.3/§2.6/§2.7 that are not part of
  * the build dataflow: dashboard stats (A5), level scans (Q7/Q8), document
  * resolution/guards (Q4/Q5/Q6), and the removal cascades (G6/G7).
  *
  * Removals are expressed as snapshot→snapshot transformations (left-anti
  * joins), never mutation: at 100 TB a delete is a rewritten table (or an
  * Iceberg MERGE), and the anti-join shape is exactly what the connector
  * pushes down. Reference semantics:
  *   - node removal cascades to its edges + properties, detaches children
  *     (eschergraph simple_repository.py:725-767);
  *   - document removal deletes objects whose provenance references ONLY
  *     this doc, and strips the doc's Meta entries from shared objects
  *     (simple_repository.py:769-835).
  */
object GraphOps {

  /** A5 — dashboard stats: per-level counts + top-k level-0 nodes by degree
    * (reference visualization/dashboard_maker.py:33-79). Degree is computed
    * on the exploded endpoint stream — one shuffle on node id, no self-join.
    * Output: (section, key, value). */
  def stats(nodes: DataFrame, edges: DataFrame, properties: DataFrame, topK: Int = 5): DataFrame = {
    val levelCounts = nodes.groupBy(col("level"))
      .agg(count(lit(1)).as("value"))
      .select(lit("nodes_at_level").as("section"),
        col("level").cast("string").as("key"), col("value"))
    // global aggregates (not literal groupBys) so an empty table still
    // yields its total=0 row
    def total(df: DataFrame, key: String) =
      df.agg(count(lit(1)).as("value"))
        .select(lit("total").as("section"), lit(key).as("key"), col("value"))
    val totals = total(nodes, "nodes")
      .unionByName(total(edges, "edges"))
      .unionByName(total(properties, "properties"))
    val degree = edges.select(explode(array(col("frm"), col("to"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("value"))
    val topNodes = nodes.filter(col("level") === 0)
      .join(degree, Seq("id"))
      .orderBy(col("value").desc, col("name").asc)
      .limit(topK)
      .select(lit("top_degree").as("section"), col("name").as("key"), col("value"))
    totals.unionByName(levelCounts).unionByName(topNodes)
  }

  /** Q7 — max level present in the graph; -1 for an empty graph (max over
    * zero rows is NULL, which would NPE an unguarded getInt). */
  def maxLevel(nodes: DataFrame): Int =
    nodes.agg(coalesce(max(col("level")), lit(-1))).head().getInt(0)

  /** Q8 — all nodes at a level (partition-prunable when the nodes table is
    * partitioned by level, which [[graft.app.BuildMain]] does). */
  def atLevel(nodes: DataFrame, level: Int): DataFrame =
    nodes.filter(col("level") === level)

  /** Q4 — duplicate-document guard (reference graph/utils.py:13-41). */
  def documentExists(documents: DataFrame, name: String): Boolean =
    !documents.filter(col("name") === name).isEmpty

  /** Q5 — search precondition: the graph must have level-0 nodes
    * (reference graph/utils.py:44-53). */
  def searchReady(nodes: DataFrame): Boolean =
    !nodes.filter(col("level") === 0).isEmpty

  /** Q6 — filename → document-id resolution; unresolved names are an error
    * (reference graph/utils.py:56-81). */
  def resolveDocumentIds(documents: DataFrame, names: Seq[String]): Seq[String] = {
    val rows = documents.filter(col("name").isin(names: _*))
      .select(col("name"), col("id")).collect()
    val found = rows.map(_.getString(0)).toSet
    val missing = names.filterNot(found)
    require(missing.isEmpty, s"documents not found: ${missing.mkString(", ")}")
    rows.map(_.getString(1)).toSeq
  }

  case class GraphSnapshot(nodes: DataFrame, edges: DataFrame, properties: DataFrame)

  /** G6 — node-removal cascade: drop the nodes, their edges (either
    * endpoint) and properties, detach survivors whose community pointer or
    * child list referenced a victim. `victims` is a 1-column DataFrame of
    * node ids — broadcast-small in the reference's interactive use
    * (simple_repository.py:725-767 deletes one node at a time); for bulk
    * deletes beyond broadcast size the same plan works with the hint
    * removed (Catalyst falls back to a shuffled join). */
  def removeNodes(g: GraphSnapshot, victims: DataFrame): GraphSnapshot = {
    val v = broadcast(victims.select(col(victims.columns.head).as("victim_id")).distinct())
    val vSet = broadcast(v.agg(collect_set(col("victim_id")).as("vs")))
    val nodes = g.nodes
      .join(v, g.nodes("id") === v("victim_id"), "left_anti")
      .crossJoin(vSet)
      .withColumn("community_id",
        when(array_contains(col("vs"), col("community_id")), lit(""))
          .otherwise(col("community_id")))
      .withColumn("child_ids",
        filter(col("child_ids"), c => !array_contains(col("vs"), c)))
      .drop("vs")
    val edges = g.edges
      .join(v, g.edges("frm") === v("victim_id"), "left_anti")
      .join(v, g.edges("to") === v("victim_id"), "left_anti")
    val properties = g.properties
      .join(v, g.properties("node_id") === v("victim_id"), "left_anti")
    GraphSnapshot(nodes, edges, properties)
  }

  /** A7/G5 — snapshot diff: the append-only replacement for the
    * reference's mutable ChangeLog fold (prepare_sync_data.py:80-93, which
    * reduces CREATE/UPDATE/DELETE logs per object to "insert" or
    * "delete"). Two snapshots of any keyed table → (id, action) where
    * action ∈ {create, delete, update}; the vector-db sync applies
    * deletes then upserts. Left-anti joins both ways + an inner join on
    * changed payloads — all equi-joins on the id, broadcast when one
    * side is small, AQE otherwise. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String): DataFrame = {
    // to_json does not canonicalize map key order, so semantically equal
    // rows could hash differently and emit spurious updates — replace every
    // MapType column with its key-sorted entry array before hashing
    def canonical(df: DataFrame): Seq[org.apache.spark.sql.Column] =
      df.schema.fields.sortBy(_.name).map { f =>
        f.dataType match {
          case _: org.apache.spark.sql.types.MapType =>
            array_sort(map_entries(col(f.name))).as(f.name)
          case _ => col(f.name)
        }
      }.toSeq
    val o = oldSnap.select(col(idCol).as("id"),
      sha2(to_json(struct(canonical(oldSnap): _*)), 256).as("old_hash"))
    val n = newSnap.select(col(idCol).as("id"),
      sha2(to_json(struct(canonical(newSnap): _*)), 256).as("new_hash"))
    val created = n.join(o, Seq("id"), "left_anti").select(col("id"), lit("create").as("action"))
    val deleted = o.join(n, Seq("id"), "left_anti").select(col("id"), lit("delete").as("action"))
    val updated = n.join(o, Seq("id"))
      .filter(col("new_hash") =!= col("old_hash"))
      .select(col("id"), lit("update").as("action"))
    created.unionByName(deleted).unionByName(updated)
  }

  /** Tag stats (reference doc_tags maintenance, simple_repository.py:
    * 629-648: tag key → number of documents carrying it). The reference
    * mutates the count on every add/remove; here it's recomputed from the
    * documents snapshot — one narrow scan of the tags column, consistent
    * under replay (the same append-only stance as [[snapshotDiff]]). */
  def tagStats(documents: DataFrame): DataFrame =
    documents.select(explode(map_keys(col("tags"))).as("tag"))
      .groupBy(col("tag")).agg(count(lit(1)).as("n_docs"))

  /** F7 — tag filter (reference simple_repository.py:692-723): a document
    * matches iff every filter tag is present with an equal value; with
    * `ignoreMissing` a document lacking the tag key is not disqualified
    * by it. Plain map functions — stays in codegen, pushes nothing to the
    * scan but prunes to the tags column only. */
  def filterByTags(documents: DataFrame, tags: Map[String, String],
                   ignoreMissing: Boolean = false): DataFrame =
    tags.foldLeft(documents) { case (df, (k, v)) =>
      val present = map_contains_key(col("tags"), lit(k))
      val equal = element_at(col("tags"), lit(k)) === lit(v)
      df.filter(if (ignoreMissing) !present || equal else present && equal)
    }

  /** G7 — document-removal cascade: objects whose provenance metadata
    * references ONLY this document are deleted; shared objects just lose
    * this document's Meta entries (reference simple_repository.py:769-835).
    * Every level carries provenance in our model (community/doc nodes are
    * stamped with their document's id at build time), so one uniform
    * strip-and-drop expresses the whole cascade — a narrow map + filter,
    * no shuffle at all. */
  def removeDocument(g: GraphSnapshot, docId: String): GraphSnapshot = {
    def strip(df: DataFrame): DataFrame = df
      .withColumn("metadata",
        filter(col("metadata"), m => m.getField("document_id") =!= docId))
      .filter(size(col("metadata")) > 0)
    GraphSnapshot(strip(g.nodes), strip(g.edges), strip(g.properties))
  }
}
