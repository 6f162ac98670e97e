package graft

import graft.core._
import graft.viz.Visualizer

/** Visualizer semantics vs reference visualization/visualizer.py:18-97:
  * one level sliced, value = node degree, one palette color per community,
  * edges restricted to the level's nodes, self-contained deterministic HTML. */
class VisualizerSpec extends SparkSpec {
  import spark.implicits._

  private def meta(doc: String, chunk: Int) = Seq(Meta(doc, chunk))

  private lazy val nodes = Seq(
    NodeRow("n1", "alpha", "first <desc>", 0, is_visual = false, "c1", Seq(), meta("d1", 0)),
    NodeRow("n2", "beta", "second", 0, is_visual = false, "c1", Seq(), meta("d1", 0)),
    NodeRow("n3", "gamma", "third", 0, is_visual = false, "c2", Seq(), meta("d1", 1)),
    NodeRow("c1", "alpha network", "", 1, is_visual = false, "doc1", Seq("n1", "n2"), meta("d1", -1)),
    NodeRow("doc1", "d1", "summary", 2, is_visual = false, "", Seq("c1"), meta("d1", -1))
  ).toDF()

  private lazy val edges = Seq(
    EdgeRow("e12", "n1", "n2", "knows", meta("d1", 0)),
    EdgeRow("e13", "n1", "n3", "cites", meta("d1", 1)),
    EdgeRow("eC", "c1", "doc1", "in", meta("d1", -1)) // crosses levels
  ).toDF()

  test("visualData slices the level, computes degree, keeps level-internal edges") {
    val (vn, ve) = Visualizer.visualData(nodes, edges, level = 0)
    val byName = vn.collect().map(r => r.getAs[String]("name") -> r.getAs[Long]("degree")).toMap
    assert(byName === Map("alpha" -> 2L, "beta" -> 1L, "gamma" -> 1L))
    val es = ve.collect().map(r => (r.getAs[String]("frm_name"), r.getAs[String]("to_name"))).toSet
    assert(es === Set(("alpha", "beta"), ("alpha", "gamma"))) // cross-level edge excluded
  }

  test("maxNodes caps by degree and drops edges to evicted nodes") {
    val (vn, ve) = Visualizer.visualData(nodes, edges, level = 0, maxNodes = 1)
    assert(vn.collect().map(_.getAs[String]("name")).toSeq === Seq("alpha"))
    assert(ve.count() === 0) // both edges touch an evicted endpoint
  }

  test("hlsToHex matches colorsys.hls_to_rgb on seaborn's hls anchors") {
    // python: colorsys.hls_to_rgb(h, 0.6, 0.65) -> *255, round
    assert(Visualizer.hlsToHex(0.0) === "#db5757")   // red anchor
    assert(Visualizer.hlsToHex(1.0 / 3.0) === "#57db57") // green anchor
    assert(Visualizer.hlsToHex(2.0 / 3.0) === "#5757db") // blue anchor
    assert(Visualizer.hlsToHex(0.25) === "#99db57")
    assert(Visualizer.hlsToHex(0.1) === "#dba657")
  }

  test("renderHtml is deterministic, self-contained, and colors by community") {
    val (vn, ve) = Visualizer.visualData(nodes, edges, level = 0)
    val h1 = Visualizer.renderHtml(vn.collect().toSeq, ve.collect().toSeq)
    val h2 = Visualizer.renderHtml(vn.collect().reverse.toSeq, ve.collect().toSeq)
    assert(h1 === h2) // row order must not matter
    Seq("alpha", "beta", "gamma").foreach(n => assert(h1.contains("\"" + n + "\"")))
    assert(!h1.contains("http")) // no CDN — works on an offline cluster edge node
    assert(h1.contains("\\u003cdesc>")) // description embedded, < escaped
    // edges reference node IDS (names are labels only)
    assert(h1.contains("\"from\":\"n1\",\"to\":\"n2\""))
    // two communities -> exactly two distinct palette colors, same color within c1
    val colors = "#[0-9a-f]{6}".r.findAllIn(h1).toSeq.filterNot(_ == "#000000")
    val nodeColors = "\"color\":\"(#[0-9a-f]{6})\"".r.findAllMatchIn(h1).map(_.group(1)).toSeq
    assert(nodeColors.size === 3 && nodeColors.distinct.size === 2)
    assert(colors.nonEmpty)
  }

  test("same-named nodes from different documents stay distinct (keyed by id)") {
    val nn = Seq(
      NodeRow("a1", "acme corp", "doc1's acme", 0, is_visual = false, "c1", Seq(), meta("d1", 0)),
      NodeRow("a2", "acme corp", "doc2's acme", 0, is_visual = false, "c2", Seq(), meta("d2", 0)),
      NodeRow("b1", "beta", "", 0, is_visual = false, "c1", Seq(), meta("d1", 0))
    ).toDF()
    val ee = Seq(EdgeRow("e1", "a2", "b1", "cites", meta("d2", 0))).toDF()
    val (vn, ve) = Visualizer.visualData(nn, ee, level = 0)
    val html = Visualizer.renderHtml(vn.collect().toSeq, ve.collect().toSeq)
    // both acme nodes render as separate JSON entries with their own ids
    assert(html.contains("\"id\":\"a1\"") && html.contains("\"id\":\"a2\""))
    // the edge attaches to a2 specifically, not to whichever 'acme corp'
    // happened to be indexed last
    assert(html.contains("\"from\":\"a2\",\"to\":\"b1\""))
    assert(!html.contains("\"from\":\"a1\""))
  }

  test("visualizeGraph writes the html file end-to-end") {
    val out = java.nio.file.Files.createTempDirectory("viz").resolve("g.html")
    val html = Visualizer.visualizeGraph(nodes, edges, level = 0, out.toString)
    assert(java.nio.file.Files.size(out) > 0)
    assert(new String(java.nio.file.Files.readAllBytes(out),
      java.nio.charset.StandardCharsets.UTF_8) === html)
  }
}
