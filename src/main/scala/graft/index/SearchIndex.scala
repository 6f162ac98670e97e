package graft.index

import graft.core._
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Vector-db sync (reference eschergraph/tools/prepare_sync_data.py:13-77 +
  * persistence/vector_db/adapters/chromadb.py:53-85), rebuilt as an
  * idempotent snapshot: nodes ∪ edges ∪ properties → (id, text, type,
  * level, document_id, embedding). Text formatting per F4:
  * node → "name, description"; edge → description;
  * property → "owner_name, description" (prepare_sync_data.py:51,63,74).
  * The OpenAI embedding call is replaced by the deterministic feature-hash
  * embedding (no egress), same role and shape.
  */
object SearchIndex {

  def build(nodes: DataFrame, edges: DataFrame, properties: DataFrame): DataFrame = {
    val docIdOf = element_at(col("metadata"), 1).getField("document_id")

    val nodeRows = nodes.select(
      col("id"),
      concat_ws(", ", col("name"), col("description")).as("text"),
      lit("node").as("type"),
      col("level"),
      docIdOf.as("document_id"))

    // Edge/property LEVEL comes from the owning/endpoint node, NOT a
    // hardcoded 0: the pipeline unions level-1 community edges and
    // level-1/2 community-finding and doc-keyword properties into these
    // tables, and the reference's global search retrieves level-1 rows
    // (community reports + community edges, global_search.py via
    // SURVEY §3.3) while its local search must never surface them.
    val ownerMeta = nodes.select(col("id").as("owner_id"),
      col("name").as("owner_name"), col("level").as("owner_level"))

    val edgeRows = edges
      .join(ownerMeta.select(col("owner_id"), col("owner_level")),
        col("frm") === col("owner_id"), "left")
      .select(
        col("id"),
        col("description").as("text"),
        lit("edge").as("type"),
        coalesce(col("owner_level"), lit(0)).as("level"),
        docIdOf.as("document_id"))

    val propRows = properties
      .join(ownerMeta, col("node_id") === col("owner_id"), "left")
      .select(
        col("id"),
        // concat_ws skips NULLs (orphan owner), so no dangling ", " —
        // coalescing to "" would defeat exactly that skip
        concat_ws(", ", col("owner_name"), col("description")).as("text"),
        lit("property").as("type"),
        coalesce(col("owner_level"), lit(0)).as("level"),
        docIdOf.as("document_id"))

    nodeRows.union(edgeRows).union(propRows)
      .withColumn("embedding", graft.functions.EmbedText(col("text")))
  }
}
