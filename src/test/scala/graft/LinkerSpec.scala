package graft

import graft.core._
import graft.functions.TextFns
import graft.link.{ConnectedComponents, Linker}
import org.apache.spark.sql.functions._

/** Linking semantics: token_set_ratio fixtures, cluster resolution
  * (reference tests/tools/test_node_matcher.py:20-67 surface forms), and
  * connected components vs brute-force transitive closure (seeded
  * property-style sweep). */
class LinkerSpec extends SparkSpec {

  test("token_set_ratio: subset aliases score 100, distinct names do not match") {
    assert(TextFns.tokenSetRatio("Lennart", "Lennart Timmermans") === 100)
    assert(TextFns.tokenSetRatio("Timmermans", "Patrick Timmermans") === 100)
    assert(TextFns.tokenSetRatio("Dr Elena Vasquez", "elena vasquez") === 100)
    assert(TextFns.tokenSetRatio("Elena Vasquez", "Elena Park") < 95)
    assert(TextFns.tokenSetRatio("Vertex Analytics Group", "Solstice Analytics Group") < 95)
    assert(TextFns.tokenSetRatio("same", "same") === 100)
  }

  test("cluster resolution: Timmermans fixture (ambiguous mention assigned by context)") {
    // surface forms from the reference's identifying_nodes prompt example
    val members = Vector(
      ("lennart", "Lennart", "lennart works on search infrastructure"),
      ("lennart timmermans", "Lennart Timmermans", "lennart timmermans works on search infrastructure"),
      ("patrick timmermans", "Patrick Timmermans", "patrick timmermans leads the finance team"),
      ("timmermans", "Timmermans", "timmermans works on search infrastructure"))
    val res = Linker.resolveCluster(members)
    val canon = res.map(r => r.name_norm -> r.canonical_norm).toMap
    assert(canon("lennart") === "lennart timmermans")
    assert(canon("lennart timmermans") === "lennart timmermans")
    assert(canon("patrick timmermans") === "patrick timmermans")
    // ambiguous "timmermans": context mentions search infra -> Lennart
    assert(canon("timmermans") === "lennart timmermans")
    // and only the ambiguous member carries the candidate set
    assert(res.find(_.name_norm == "timmermans").get.candidates.map(_._1).sorted ===
      Vector("lennart timmermans", "patrick timmermans"))
    assert(res.filter(_.name_norm != "timmermans").forall(_.candidates.isEmpty))
  }

  test("A6 containment gathering: candidate context reaches names that CONTAIN it") {
    import spark.implicits._
    // "The John Smithsonian" is NOT in the smith-cluster (token_set_ratio
    // vs "john smith" < 95) but CONTAINS the candidate string "john smith",
    // so reference containment gathering (node_matcher.py:118-131) credits
    // its cardiology description to candidate "john smith". The ambiguous
    // mention "smith" talks about the cardiology department -> must resolve
    // to John Smith; exact-name gathering would tie at 0 and fall to the
    // lexicographic tie-break ("mary smith").
    val logs = spark.createDataset(Seq(
      ExtractionLog("d1", 0, is_visual = false,
        nodes = Seq(
          NodeExt("John Smith", "a person"),
          NodeExt("Mary Smith", "an engineer who designs bridges"),
          NodeExt("The John Smithsonian", "heads the cardiology department research wing")),
        edges = Seq(EdgeExt("Smith", "Research Council", "heads research in cardiology department wing")),
        properties = Seq(), main_visual_entity = "")))
    val mapping = Linker.canonicalMapping(logs)
    val docRow = mapping.filter(col("chunk_id") === -1 && col("name_norm") === "smith").collect()
    assert(docRow.length === 1)
    assert(docRow.head.getAs[String]("canonical_norm") === "john smith")
    // the per-chunk override agrees (same containment context drives it)
    val chunkRow = mapping.filter(col("chunk_id") === 0 && col("name_norm") === "smith").collect()
    assert(chunkRow.head.getAs[String]("canonical_norm") === "john smith")
  }

  test("single-maximal cluster maps every alias to it") {
    val members = Vector(
      ("dr elena vasquez", "Dr Elena Vasquez", "d1"),
      ("elena vasquez", "Elena Vasquez", "d2"),
      ("vasquez", "Vasquez", "d3"))
    val canon = Linker.resolveCluster(members).map(r => r.name_norm -> r.canonical_norm).toMap
    assert(canon.values.toSet === Set("dr elena vasquez"))
  }

  test("connected components equal brute-force transitive closure (seeded sweep)") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val pairs = List.fill(12)((rng.nextInt(15), rng.nextInt(15)))
      val vs = (0 to 14).map(i => ("k", f"v$i%02d"))
      val es = pairs.map { case (a, b) => ("k", f"v$a%02d", f"v$b%02d") }
      val got = ConnectedComponents.run(
          vs.toDF("key", "v"), es.toDF("key", "a", "b"))
        .collect().map(r => r.getString(1) -> r.getString(2)).toMap
      val gotPerKey = ConnectedComponents.runPerKey(
          vs.toDF("key", "v"), es.toDF("key", "a", "b"))
        .collect().map(r => r.getString(1) -> r.getString(2)).toMap
      val gotBigStar = ConnectedComponents.runBigStar(
          vs.toDF("key", "v"), es.toDF("key", "a", "b"))
        .collect().map(r => r.getString(1) -> r.getString(2)).toMap
      // brute force union-find
      val parent = scala.collection.mutable.Map(vs.map(v => v._2 -> v._2).toSeq: _*)
      def find(x: String): String = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(f"v$a%02d"), find(f"v$b%02d"))
        if (ra != rb) parent(ra) = rb
      }
      val expect = vs.map { case (_, v) =>
        v -> vs.map(_._2).filter(u => find(u) == find(v)).min
      }.toMap
      assert(got === expect, s"pairs=$pairs")
      assert(gotPerKey === expect, s"(perKey) pairs=$pairs")
      assert(gotBigStar === expect, s"(bigStar) pairs=$pairs")
    }
  }

  test("large-star/small-star handles diameter far beyond its round count") {
    // a 200-node chain: min-label propagation needs 200 rounds (its
    // default cap is 25); star contraction collapses it in O(log² n)
    import spark.implicits._
    val n = 200
    val vs = (0 until n).map(i => ("k", f"v$i%03d")).toDF("key", "v")
    val es = (0 until n - 1).map(i => ("k", f"v$i%03d", f"v${i + 1}%03d"))
      .toDF("key", "a", "b")
    val got = ConnectedComponents.runBigStar(vs, es)
      .collect().map(r => r.getString(1) -> r.getString(2))
    assert(got.length === n, "every declared vertex emitted exactly once")
    assert(got.forall(_._2 == "v000"), "one chain => one component rooted at min")
  }

  test("large-star/small-star scopes labels per key (shared vertex names)") {
    import spark.implicits._
    // the same vertex names exist under both keys; edges join them only
    // under k1 — k2's copies must stay singletons
    val vs = Seq(("k1", "a"), ("k1", "b"), ("k2", "a"), ("k2", "b"))
      .toDF("key", "v")
    val es = Seq(("k1", "a", "b")).toDF("key", "a", "b")
    val got = ConnectedComponents.runBigStar(vs, es)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(got === Map(("k1", "a") -> "a", ("k1", "b") -> "a",
      ("k2", "a") -> "a", ("k2", "b") -> "b"))
  }

  test("large-star/small-star: ghosts bridge, singletons self-label, empty edges") {
    import spark.implicits._
    val vs = Seq(("k", "a"), ("k", "b"), ("k", "z")).toDF("key", "v")
    val es = Seq(("k", "a", "x"), ("k", "x", "b")).toDF("key", "a", "b")
    val got = ConnectedComponents.runBigStar(vs, es)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(got === Map("a" -> "a", "b" -> "a", "z" -> "z"))
    val empty = ConnectedComponents.runBigStar(vs, es.limit(0))
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(empty === Map("a" -> "a", "b" -> "b", "z" -> "z"))
  }

  test("runPerKey conserves every vertex at HashMap growth-trigger sizes") {
    // regression: the fold once emitted via parent.keysIterator while
    // find() was still path-compressing; scala 2.13 HashMap.put checks the
    // growth trigger BEFORE probing for the existing key, so a value
    // update on an existing key can RESIZE the table mid-iteration and
    // the live iterator skips entries. 11 members (trigger = 12 at the
    // default capacity 16) + a chain that leaves a deep uncompressed path
    // at emission is the smallest shape that can fire it.
    import spark.implicits._
    val vs = (0 to 10).map(i => ("k", f"v$i%02d"))
    val es = (9 to 0 by -1).map(i => ("k", f"v$i%02d", f"v${i + 1}%02d"))
    val out = ConnectedComponents.runPerKey(
        vs.toDF("key", "v").coalesce(1), es.toDF("key", "a", "b").coalesce(1))
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(out.map(_._1).sorted.toSeq === vs.map(_._2).sorted.toSeq,
      "every vertex must be emitted exactly once")
    assert(out.forall(_._2 == "v00"), "single chain => one component rooted at min")
  }

  test("undeclared edge endpoints bridge but are not emitted (run == runPerKey)") {
    import spark.implicits._
    val vs = Seq(("k", "a"), ("k", "b")).toDF("key", "v")
    // "x" never appears as a vertex: it must connect a and b into one
    // component without appearing in the output of either implementation
    val es = Seq(("k", "a", "x"), ("k", "x", "b")).toDF("key", "a", "b")
    val expect = Map("a" -> "a", "b" -> "a")
    val got = ConnectedComponents.run(vs, es)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    val gotPerKey = ConnectedComponents.runPerKey(vs, es)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(got === expect)
    assert(gotPerKey === expect)
  }

  test("prefix blocking reaches single-token spelling variants") {
    import spark.implicits._
    // disjoint token sets, no shared full token — shared-token blocking
    // would never pair them; the reference's O(n^2) matcher scores them 95
    val names = Seq(("d1", "internationalization"), ("d1", "internationalisation"))
      .toDF("doc_id", "name_norm")
      .withColumn("display", col("name_norm"))
      .withColumn("descs", lit(""))
    val pairs = Linker.matchedPairs(names)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("internationalisation", "internationalization")))
  }

  test("blocking join finds exactly the >=95 pairs on a doc's names") {
    import spark.implicits._
    val names = Seq(
      ("d1", "dr elena vasquez"), ("d1", "elena vasquez"), ("d1", "vasquez"),
      ("d1", "vertex analytics group"), ("d1", "vertex analytics"),
      ("d2", "elena vasquez"), ("d2", "marco petrov"))
      .toDF("doc_id", "name_norm")
      .withColumn("display", col("name_norm"))
      .withColumn("descs", lit(""))
    val pairs = Linker.matchedPairs(names)
      .select("doc_id", "a", "b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(pairs === Set(
      ("d1", "dr elena vasquez", "elena vasquez"),
      ("d1", "dr elena vasquez", "vasquez"),
      ("d1", "elena vasquez", "vasquez"),
      ("d1", "vertex analytics", "vertex analytics group")))
    // no cross-doc pairs: linking is per-document (reference name index is per doc)
    assert(!pairs.exists { case (_, a, b) => a.contains("marco") || b.contains("marco") })
  }
}
