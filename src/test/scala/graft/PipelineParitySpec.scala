package graft

import graft.core._
import graft.extract.DeterministicExtractor
import graft.pipeline.BuildPipeline
import org.apache.spark.sql.functions._

/** End-to-end parity gate (BASELINE.json north_rule): the pipeline's
  * canonical (doc_id, subj, pred, obj) triple set must match the
  * by-construction oracle of the synthetic interleaved corpus at
  * P/R >= 0.95. */
class PipelineParitySpec extends SparkSpec {

  val nDocs = 120L

  lazy val result = BuildPipeline.run(
    Corpus.docs(spark, nDocs), new DeterministicExtractor)
  lazy val oracle = Corpus.oracleTriples(spark, nDocs).toDF()

  test("triple parity P/R >= 0.95 vs oracle") {
    val (p, r) = BuildPipeline.parity(result.triples, oracle)
    info(f"precision=$p%.4f recall=$r%.4f")
    assert(p >= 0.95, f"precision $p%.4f below 0.95")
    assert(r >= 0.95, f"recall $r%.4f below 0.95")
  }

  test("nodes exist at all three levels with the reference semantics") {
    val byLevel = result.nodes.groupBy("level").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byLevel.getOrElse(0, 0L) > 0, "no level-0 nodes")
    assert(byLevel.getOrElse(1, 0L) > 0, "no community nodes")
    assert(byLevel.getOrElse(2, 0L) === nDocs, "one document node per doc")
  }

  test("communities disjointly cover the level-0 nodes") {
    val l0 = result.nodes.filter(col("level") === 0)
    assert(l0.filter(col("community_id") === "").count() === 0)
    // every level-0 node appears in exactly one community's child list
    val fromChildren = result.nodes.filter(col("level") === 1)
      .select(explode(col("child_ids")).as("id"))
    assert(fromChildren.count() === l0.count())
    assert(fromChildren.distinct().count() === l0.count())
  }

  test("inter-community edges equal the community-crossing level-0 edge set") {
    val membership = result.nodes.filter(col("level") === 0)
      .select(col("id"), col("community_id"))
    val e0 = result.edges.join(membership.withColumnRenamed("id", "frm")
        .withColumnRenamed("community_id", "cf"), Seq("frm"))
      .join(membership.withColumnRenamed("id", "to")
        .withColumnRenamed("community_id", "ct"), Seq("to"))
    val crossing = e0.filter(col("cf") =!= col("ct")).count()
    val commEdges = result.edges.join(
      result.nodes.filter(col("level") === 1).select(col("id").as("frm")), Seq("frm"))
      .count()
    assert(commEdges === crossing)
    assert(crossing > 0, "community refinement should split components (non-vacuous invariant)")
  }

  test("document nodes: children are that doc's communities") {
    val docChildren = result.nodes.filter(col("level") === 2)
      .select(col("name").as("doc_id"), explode(col("child_ids")).as("cid"))
    val comms = result.nodes.filter(col("level") === 1).select(col("id").as("cid"))
    assert(docChildren.join(comms, Seq("cid"), "left_anti").count() === 0)
    assert(docChildren.count() === comms.count())
  }

  test("no dropped edges on the synthetic corpus") {
    assert(result.droppedEdges.count() === 0)
  }

  test("search index covers nodes+edges+properties and quick search returns scored hits") {
    val n = result.nodes.count() + result.edges.count() + result.properties.count()
    assert(result.searchIndex.count() === n)
    val idx = result.searchIndex.cache()
    val someName = result.nodes.filter(col("level") === 0)
      .orderBy(col("name")).select("name").first().getString(0)
    val hits = graft.query.Search.quickSearch(idx, s"what relates to $someName")
    assert(hits.count() > 0)
    assert(hits.filter(col("score") <= 0.1).count() === 0)
  }

  test("parity holds on an independent seed (different corpus draw)") {
    val n = 150L
    val seed = 20260816L
    val r = BuildPipeline.run(Corpus.docs(spark, n, seed), new DeterministicExtractor)
    val (p, rec) = BuildPipeline.parity(r.triples, Corpus.oracleTriples(spark, n, seed).toDF())
    info(f"seed=$seed precision=$p%.4f recall=$rec%.4f")
    assert(p >= 0.95 && rec >= 0.95)
  }

  test("search enrichment (J8) resolves every hit to its graph row + parents") {
    val someName = result.nodes.filter(col("level") === 0)
      .orderBy(col("name")).select("name").first().getString(0)
    val hits = graft.query.Search.quickSearch(result.searchIndex, s"who partners with $someName")
    val enriched = graft.query.Search.enrich(hits, result.nodes, result.edges, result.properties)
    assert(enriched.count() === hits.count())
    // every hit resolves: subject non-null; edges carry both endpoint names
    assert(enriched.filter(col("subject").isNull || col("subject") === "").count() === 0)
    val edgeRows = enriched.filter(col("type") === "edge")
    if (!edgeRows.isEmpty) {
      assert(edgeRows.filter(size(col("parent_names")) =!= 2).count() === 0)
      assert(edgeRows.filter(get(col("parent_names"), lit(0)).isNull ||
        get(col("parent_names"), lit(1)).isNull).count() === 0)
    }
  }
}
