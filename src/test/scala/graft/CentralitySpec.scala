package graft

import graft.query.Centrality

/** PageRank vs a driver-side power iteration (same formulation: uniform
  * teleport, dangling mass redistributed, fixed iterations). */
class CentralitySpec extends SparkSpec {
  import spark.implicits._

  private def refPageRank(edges: Seq[(String, String)], iters: Int,
                          d: Double): Map[String, Double] = {
    val vs = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = vs.size
    val out = edges.groupBy(_._1).map { case (u, es) => u -> es.size }
    var r = vs.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = vs.filterNot(out.contains).map(r).sum
      val inflow = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / out(u) }.sum
      }
      r = vs.map(v =>
        v -> ((1 - d) / n + d * (inflow.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  test("pageRank: hand graph with a dangling sink matches power iteration; mass = 1") {
    // c is the hub; e is dangling (no out-edges); parallel edge a->c counts twice
    val es = Seq(("a", "b"), ("a", "c"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("d", "c"), ("c", "e"))
    val got = Centrality.pageRank(es.toDF("frm", "to"))
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("rank")).toMap
    val exp = refPageRank(es, iters = 10, d = 0.85)
    assert(got.keySet === exp.keySet)
    exp.foreach { case (v, r) => assert(math.abs(got(v) - r) <= 1e-6 + 1e-9, v) }
    assert(math.abs(got.values.sum - 1.0) <= 1e-5)
    // the hub out-ranks everything else
    assert(got("c") === got.values.max)
  }

  test("pageRank: synthetic 300-node graph — mass conserved, ranks match reference") {
    // deterministic pseudo-random digraph: 3 out-edges per node
    val es = (0 until 300).flatMap { i =>
      Seq(1, 2, 3).map(j => (s"n$i", s"n${(i * 31 + j * 97) % 300}"))
    }
    val got = Centrality.pageRank(es.toDF("frm", "to"), iterations = 5)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("rank")).toMap
    val exp = refPageRank(es, iters = 5, d = 0.85)
    assert(got.size === exp.size)
    exp.foreach { case (v, r) => assert(math.abs(got(v) - r) <= 1e-6 + 1e-9, v) }
    assert(math.abs(got.values.sum - 1.0) <= 1e-4)
  }

  test("pageRank: empty edge set yields empty result; bad params rejected") {
    val empty = Seq.empty[(String, String)].toDF("frm", "to")
    assert(Centrality.pageRank(empty).count() === 0)
    intercept[IllegalArgumentException] {
      Centrality.pageRank(empty, iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Centrality.pageRank(empty, damping = 1.0)
    }
  }
}
