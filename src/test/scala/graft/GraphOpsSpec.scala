package graft

import graft.core._
import graft.query.GraphOps
import graft.query.GraphOps.GraphSnapshot
import org.apache.spark.sql.functions._

/** Graph-admin operator semantics (SURVEY.md §2: A5, Q4-Q8, G6, G7).
  * Removal cascades mirror reference
  * simple_repository.py:725-767 (node) and :769-835 (document). */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def meta(doc: String, chunk: Int) = Seq(Meta(doc, chunk))

  lazy val g: GraphSnapshot = {
    val nodes = Seq(
      NodeRow("n1", "alpha", "d", 0, is_visual = false, "c1", Seq(), meta("d1", 0)),
      NodeRow("n2", "beta", "d", 0, is_visual = false, "c1", Seq(), meta("d1", 0) ++ meta("d2", 3)),
      NodeRow("n3", "gamma", "d", 0, is_visual = false, "c2", Seq(), meta("d2", 1)),
      NodeRow("c1", "alpha network", "", 1, is_visual = false, "doc1", Seq("n1", "n2"), meta("d1", -1)),
      NodeRow("c2", "gamma network", "", 1, is_visual = false, "doc2", Seq("n3"), meta("d2", -1)),
      NodeRow("doc1", "d1", "summary", 2, is_visual = false, "", Seq("c1"), meta("d1", -1)),
      NodeRow("doc2", "d2", "summary", 2, is_visual = false, "", Seq("c2"), meta("d2", -1))
    ).toDF()
    val edges = Seq(
      EdgeRow("e12", "n1", "n2", "knows", meta("d1", 0)),
      EdgeRow("e23", "n2", "n3", "cites", meta("d2", 1))
    ).toDF()
    val props = Seq(
      PropertyRow("p1", "n1", "smart", meta("d1", 0)),
      PropertyRow("p3", "n3", "tall", meta("d2", 1))
    ).toDF()
    GraphSnapshot(nodes, edges, props)
  }

  test("A5 stats: totals, per-level counts, top-degree nodes") {
    val rows = GraphOps.stats(g.nodes, g.edges, g.properties, topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.contains(("total", "nodes", 7L)))
    assert(rows.contains(("total", "edges", 2L)))
    assert(rows.contains(("total", "properties", 2L)))
    assert(rows.contains(("nodes_at_level", "0", 3L)))
    assert(rows.contains(("nodes_at_level", "1", 2L)))
    // n2 touches both edges → degree 2, top-1
    assert(rows.contains(("top_degree", "beta", 2L)))
  }

  test("Q7/Q8: max level and level scans") {
    assert(GraphOps.maxLevel(g.nodes) === 2)
    assert(GraphOps.atLevel(g.nodes, 1).count() === 2)
  }

  test("Q4/Q5/Q6: document guards and resolution") {
    val docs = Seq(
      DocumentRow("id-d1", "d1", 3, 100, Map()),
      DocumentRow("id-d2", "d2", 2, 80, Map())).toDF()
    assert(GraphOps.documentExists(docs, "d1"))
    assert(!GraphOps.documentExists(docs, "zzz"))
    assert(GraphOps.searchReady(g.nodes))
    assert(GraphOps.resolveDocumentIds(docs, Seq("d1", "d2")).toSet === Set("id-d1", "id-d2"))
    intercept[IllegalArgumentException] {
      GraphOps.resolveDocumentIds(docs, Seq("d1", "missing"))
    }
  }

  test("G6 node removal cascades to edges/properties and detaches pointers") {
    val out = GraphOps.removeNodes(g, Seq("n2").toDF("id"))
    assert(out.nodes.filter(col("id") === "n2").isEmpty)
    // both edges touched n2 → gone
    assert(out.edges.count() === 0)
    // properties of other nodes survive
    assert(out.properties.select("id").as[String].collect().toSet === Set("p1", "p3"))
    // n2 dropped from c1's child list
    val c1 = out.nodes.filter(col("id") === "c1").select("child_ids").as[Seq[String]].head()
    assert(c1 === Seq("n1"))
  }

  test("G6 removing a community blanks members' community pointers") {
    val out = GraphOps.removeNodes(g, Seq("c1").toDF("id"))
    val n1 = out.nodes.filter(col("id") === "n1").select("community_id").as[String].head()
    assert(n1 === "")
    val doc1 = out.nodes.filter(col("id") === "doc1").select("child_ids").as[Seq[String]].head()
    assert(doc1 === Seq())
  }

  test("A7 snapshot diff: create/delete/update classified per id") {
    val old = Seq(("a", "x", 1), ("b", "y", 2), ("c", "z", 3)).toDF("id", "payload", "v")
    val neu = Seq(("b", "y", 2), ("c", "z9", 3), ("d", "w", 4)).toDF("id", "payload", "v")
    val diff = GraphOps.snapshotDiff(old, neu, "id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(diff === Set(("a", "delete"), ("c", "update"), ("d", "create")))
  }

  test("F7 tag filter: all tags must match; ignoreMissing relaxes absent keys") {
    val docs = Seq(
      ("d1", Map("team" -> "core", "year" -> "2024")),
      ("d2", Map("team" -> "core")),
      ("d3", Map("team" -> "infra", "year" -> "2024"))
    ).toDF("id", "tags")
    val strict = GraphOps.filterByTags(docs, Map("team" -> "core", "year" -> "2024"))
      .select("id").as[String].collect().toSet
    assert(strict === Set("d1"))
    val relaxed = GraphOps.filterByTags(docs, Map("team" -> "core", "year" -> "2024"),
      ignoreMissing = true).select("id").as[String].collect().toSet
    assert(relaxed === Set("d1", "d2"))
  }

  test("F7 on a real build: tags sidecar lands on the documents table and filters") {
    import graft.extract.DeterministicExtractor
    import graft.pipeline.BuildPipeline
    val docs = Corpus.docs(spark, 12)
    val sidecar = docs.toDF().select(col("doc_id"),
      map(lit("shard"),
        when(substring(col("doc_id"), -1, 1).cast("int") % 2 === 0, lit("even"))
          .otherwise(lit("odd"))).as("tags"))
    val r = BuildPipeline.run(docs, new DeterministicExtractor, docTags = Some(sidecar))
    val even = GraphOps.filterByTags(r.documents, Map("shard" -> "even"))
      .select("name").as[String].collect().toSet
    assert(even.nonEmpty && even.size < 12)
    assert(even.forall(n => n.last.asDigit % 2 == 0))
    // tag stats: every doc carries the shard tag
    val stats = GraphOps.tagStats(r.documents).collect()
    assert(stats.map(r0 => r0.getString(0) -> r0.getLong(1)).toMap === Map("shard" -> 12L))
  }

  test("G7 document removal: only-this-doc objects die, shared ones lose provenance") {
    val out = GraphOps.removeDocument(g, "d1")
    val ids = out.nodes.select("id").as[String].collect().toSet
    // n1/c1/doc1 referenced only d1 → gone; n2 shared with d2 → survives
    assert(ids === Set("n2", "n3", "c2", "doc2"))
    val n2meta = out.nodes.filter(col("id") === "n2")
      .select("metadata").as[Seq[Meta]].head()
    assert(n2meta.map(_.document_id) === Seq("d2"))
    assert(out.edges.select("id").as[String].collect().toSet === Set("e23"))
    assert(out.properties.select("id").as[String].collect().toSet === Set("p3"))
  }
}
