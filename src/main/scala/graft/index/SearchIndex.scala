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

    val edgeRows = edges.select(
      col("id"),
      col("description").as("text"),
      lit("edge").as("type"),
      lit(0).as("level"),
      docIdOf.as("document_id"))

    val ownerNames = nodes.select(col("id").as("owner_id"), col("name").as("owner_name"))
    val propRows = properties
      .join(ownerNames, col("node_id") === col("owner_id"), "left")
      .select(
        col("id"),
        concat_ws(", ", coalesce(col("owner_name"), lit("")), col("description")).as("text"),
        lit("property").as("type"),
        lit(0).as("level"),
        docIdOf.as("document_id"))

    nodeRows.union(edgeRows).union(propRows)
      .withColumn("embedding", graft.functions.EmbedText(col("text")))
  }
}
