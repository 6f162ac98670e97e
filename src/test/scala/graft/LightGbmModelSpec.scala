package graft

import graft.sources.{LightGbmModel, PdfLayout}
import graft.sources.PdfLayout.{LayoutToken, PdfModels}
import org.scalatest.funsuite.AnyFunSuite

/** The PDF layout source's LightGBM model seam (reference
  * fast_pdf_parser/parser.py:86-123 runs two trained LightGBM models;
  * offline the engine falls back to geometric stand-ins, and this spec
  * proves the seam actually SWITCHES when a model file is supplied, with
  * the output schema unchanged — the in-repo fixtures are hand-written
  * models in the public LightGBM text format).
  *
  * Fixture A (token-type, multiclass over PdfLayout.TokenTypeLabels'
  * 11-class order): one real 2-leaf tree on feature 2 (bold) for class 8
  * = SECTION_HEADER, single-leaf stumps elsewhere — so ANY bold token is
  * a header regardless of font size, which the geometric heuristic
  * (font >= 1.15x page median) deliberately is not.
  *
  * Fixture B (paragraph, single-output): one constant negative leaf —
  * merge score always < 0, every line becomes its own segment.
  */
class LightGbmModelSpec extends AnyFunSuite {

  private def stump(i: Int, v: Double) =
    s"""Tree=$i
       |num_leaves=1
       |num_cat=0
       |leaf_value=$v
       |""".stripMargin

  private val tokenModelText: String = {
    val header =
      """tree
        |version=v4
        |num_class=11
        |num_tree_per_iteration=11
        |max_feature_idx=9
        |objective=multiclass num_class:11
        |""".stripMargin
    val headerTree = // class 8 (SECTION_HEADER): bold (feature 2) > 0.5 -> +10
      """Tree=8
        |num_leaves=2
        |num_cat=0
        |split_feature=2
        |threshold=0.5
        |decision_type=2
        |left_child=-1
        |right_child=-2
        |leaf_value=-10 10
        |""".stripMargin
    // class index = tree POSITION in the file (i % num_class) — keep the
    // blocks in index order
    val blocks = (0 to 10).map {
      case 8 => headerTree
      case i => stump(i, if (i == 6) 1.0 else -5.0) // class 6 (TEXT): +1
    }
    header + "\n" + blocks.mkString("\n") + "\nend of trees\n"
  }

  private val alwaysBreakParaText: String =
    """tree
      |version=v4
      |num_class=1
      |num_tree_per_iteration=1
      |max_feature_idx=4
      |objective=binary
      |
      |""".stripMargin + stump(0, -1.0) + "\nend of trees\n"

  private def tok(text: String, line: Int, slot: Int, font: Double = 10,
                  bold: Boolean = false) =
    LayoutToken("d1", 1, 612, 792, line * 8 + slot, text,
      left = 40 + slot * 70.0, top = 60 + line * 16.0, width = 60,
      height = 12, font_size = font, bold = bold)

  test("parser: tree walk, multiclass argmax, binary sign") {
    val m = LightGbmModel.parse(tokenModelText)
    assert(m.numClass === 11 && m.numTrees === 11 && m.maxFeatureIdx === 9)
    val bold = Array(10.0, 1.0, 1.0, 40, 60, 60, 12, 4, 0, 0)
    val plain = Array(10.0, 1.0, 0.0, 40, 60, 60, 12, 4, 0, 0)
    assert(m.predictClass(bold) === 8)  // SECTION_HEADER
    assert(m.predictClass(plain) === 6) // TEXT
    val p = LightGbmModel.parse(alwaysBreakParaText)
    assert(p.numClass === 1 && !p.predictBinary(Array(0, 12, 0, 1, 1)))
  }

  test("parser rejects categorical-split models loudly") {
    val cat = tokenModelText.replace("num_cat=0\nsplit_feature=2",
      "num_cat=1\nsplit_feature=2")
    val e = intercept[IllegalArgumentException](LightGbmModel.parse(cat))
    assert(e.getMessage.contains("categorical"))
  }

  test("load() round-trips through a file") {
    val f = java.nio.file.Files.createTempFile("graft-lgbm", ".model")
    java.nio.file.Files.writeString(f, tokenModelText)
    try assert(LightGbmModel.load(f.toString).predictClass(
      Array(10.0, 1.0, 1.0, 0, 0, 0, 0, 0, 0, 0)) === 8)
    finally java.nio.file.Files.delete(f)
  }

  test("token-type seam switches: bold small-font line is TEXT under the " +
    "heuristic, SECTION_HEADER under the model; schema unchanged") {
    // bold at page-median font: heuristic needs >= 1.15x median -> TEXT
    val toks = (0 to 7).map(s => tok(s"h$s", 0, s, font = 10, bold = true)) ++
      (0 to 7).map(s => tok(s"a$s", 1, s))
    val stub = PdfLayout.assembleDoc("d1", toks.iterator).toVector
    assert(stub.map(_.segment_type) === Vector("TEXT"))
    val m = PdfModels(Some(LightGbmModel.parse(tokenModelText)), None)
    val real = PdfLayout.assembleDoc("d1", toks.iterator, m).toVector
    assert(real.map(_.segment_type) === Vector("SECTION_HEADER", "TEXT"))
    // same ParsedSegment shape either way; text content preserved
    assert(real.map(_.text).mkString(" ") === stub.map(_.text).mkString(" "))
  }

  test("paragraph seam drives boundaries: always-break model yields one " +
    "segment per line where the heuristic merges") {
    val toks = (0 until 3).flatMap(l => (0 to 7).map(s => tok(s"w$l$s", l, s)))
    val stub = PdfLayout.assembleDoc("d1", toks.iterator).toVector
    assert(stub.length === 1) // same type, small gaps -> one paragraph
    val m = PdfModels(None, Some(LightGbmModel.parse(alwaysBreakParaText)))
    val real = PdfLayout.assembleDoc("d1", toks.iterator, m).toVector
    assert(real.length === 3)
    assert(real.map(_.text) === stub.flatMap(_.text.split(" ").grouped(8)
      .map(_.mkString(" "))).toVector)
  }

  test("seam validation rejects models trained against a different contract") {
    val tokenM = Some(LightGbmModel.parse(tokenModelText))
    val paraM = Some(LightGbmModel.parse(alwaysBreakParaText))
    // the in-contract fixtures pass through unchanged
    assert(PdfModels.validated(tokenM, "token-type", 10, Some(11)) === tokenM)
    assert(PdfModels.validated(paraM, "paragraph", 5, Some(1)) === paraM)
    assert(PdfModels.validated(None, "token-type", 10, Some(11)) === None)
    // wider feature set (e.g. the reference huridocs models): loud, names the contract
    val wide = Some(LightGbmModel.parse(
      tokenModelText.replace("max_feature_idx=9", "max_feature_idx=25")))
    val e1 = intercept[IllegalArgumentException](
      PdfModels.validated(wide, "token-type", 10, Some(11)))
    assert(e1.getMessage.contains("feature index 25") &&
      e1.getMessage.contains("10 entries"))
    // class-count mismatch: loud
    val e2 = intercept[IllegalArgumentException](
      PdfModels.validated(paraM, "token-type", 10, Some(11)))
    assert(e2.getMessage.contains("num_class=1"))
  }

  test("out-of-range predicted class falls back to TEXT (reference " +
    "TokenType.from_index convention), not the last label") {
    // 12 trees over num_class=12 with class 11 winning -> index 11, outside
    // the 11-entry TokenTypeLabels -> TEXT (the old clamp said PAGE_FOOTER)
    val header =
      "tree\nversion=v4\nnum_class=12\nnum_tree_per_iteration=12\n" +
        "max_feature_idx=9\n\n"
    val blocks = (0 to 11).map(i => stump(i, if (i == 11) 5.0 else -5.0))
    val m = LightGbmModel.parse(header + blocks.mkString("\n") + "\nend of trees\n")
    val t = tok("x", 0, 0)
    assert(PdfLayout.classifyToken(t, 10.0, Some(m)) === "TEXT")
  }

  test("default mode (no env, no models) is byte-identical to PdfModels.none") {
    val toks = (0 until 2).flatMap(l => (0 to 7).map(s => tok(s"x$l$s", l, s,
      font = if (l == 0) 14 else 10, bold = l == 0)))
    assert(sys.env.get(PdfModels.TokenModelEnv).isEmpty) // sandbox default
    val a = PdfLayout.assembleDoc("d1", toks.iterator).toVector
    val b = PdfLayout.assembleDoc("d1", toks.iterator, PdfModels.none).toVector
    val c = PdfLayout.assembleDoc("d1", toks.iterator, PdfModels.fromEnv).toVector
    assert(a === b && b === c)
  }
}
