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
}
