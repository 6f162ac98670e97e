package graft

import graft.community.LocalCommunities

class CommunitySpec extends SparkSpec {

  test("barbell graph splits into its two dense sides") {
    val members = Vector("a", "b", "c", "x", "y", "z")
    val edges = Vector(
      ("a", "b"), ("b", "c"), ("a", "c"), // triangle 1
      ("x", "y"), ("y", "z"), ("x", "z"), // triangle 2
      ("c", "x")) // bridge
    val part = LocalCommunities.refine(members, edges)
    assert(part("a") === part("b") && part("b") === part("c"))
    assert(part("x") === part("y") && part("y") === part("z"))
    assert(part("a") !== part("x"))
  }

  test("partition is a disjoint cover with dense labels") {
    val members = Vector("n1", "n2", "n3", "n4")
    val edges = Vector(("n1", "n2"), ("n3", "n4"))
    val part = LocalCommunities.refine(members, edges)
    assert(part.keySet === members.toSet)
    val labels = part.values.toSet
    assert(labels === (0 until labels.size).toSet)
  }

  test("deterministic regardless of member/edge order") {
    val members = Vector("a", "b", "c", "x", "y", "z")
    val edges = Vector(("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x"))
    val p1 = LocalCommunities.refine(members, edges)
    val p2 = LocalCommunities.refine(members.reverse, edges.reverse.map { case (u, v) => (v, u) })
    assert(p1 === p2)
  }

  test("edgeless and tiny components collapse to one community") {
    assert(LocalCommunities.refine(Vector("solo"), Vector.empty) === Map("solo" -> 0))
    assert(LocalCommunities.refine(Vector("a", "b"), Vector(("a", "b"))).values.toSet === Set(0))
  }

  test("F5 community CSV render: member properties + touching edges under headers") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // two communities; edge n2->n3 crosses them and must appear in BOTH
    val nodes = Seq(
      ("n1", "Alpha Corp", 0, "c1"), ("n2", "Beta Labs", 0, "c1"),
      ("n3", "Gamma Inc", 0, "c2"),
      ("cn", "Alpha Corp network", 1, "")) // level-1 row must be ignored
      .toDF("id", "name", "level", "community_id")
    val edges = Seq(
      ("e1", "n1", "n2", "partners with"),
      ("e2", "n2", "n3", "supplies")).toDF("id", "frm", "to", "description")
    val properties = Seq(
      ("p1", "n1", "publicly listed"), ("p2", "n2", "research lab"))
      .toDF("id", "node_id", "description")

    val csv = graft.community.Communities.communityCsv(nodes, edges, properties)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(csv.keySet === Set("c1", "c2"))
    assert(csv("c1")._1 === "node_name,property\nAlpha Corp,publicly listed\nBeta Labs,research lab")
    assert(csv("c1")._2 ===
      "from,to,description\nAlpha Corp,Beta Labs,partners with\nBeta Labs,Gamma Inc,supplies")
    // c2 has no member properties -> header-only prop csv; the crossing
    // edge still renders (reference _filter_edges: either endpoint)
    assert(csv("c2")._1 === "node_name,property")
    assert(csv("c2")._2 === "from,to,description\nBeta Labs,Gamma Inc,supplies")
  }
}
