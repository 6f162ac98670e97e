package graft

import graft.core.Kinds
import graft.sources.PdfLayout
import graft.sources.PdfLayout.LayoutToken
import org.apache.spark.sql.functions._

/** Table-cell row for the markdown test (top level: product encoders need
  * a stable TypeTag). */
case class TableCell(row_index: Int, column_index: Int, content: String)

/** S2 layout-source assembly + F8 bbox math (reference
  * fast_pdf_parser/parser.py:86-139, reader.py:241-265,
  * multi_modal_parser.py:152-165,266-312). */
class PdfLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tok(text: String, line: Int, slot: Int, page: Int = 1,
                  font: Double = 10, bold: Boolean = false) =
    LayoutToken("d1", page, 612, 792, line * 8 + slot, text,
      left = 40 + slot * 70.0, top = 60 + line * 16.0, width = 60,
      height = if (bold) 14 else 12, font_size = font, bold = bold)

  test("tokens group into lines by vertical overlap, reading order by (top,left)") {
    // two lines, second line given out of order — assembly must re-order
    val toks = Seq(tok("world", 0, 1), tok("hello", 0, 0),
      tok("bottom", 1, 0), tok("row", 1, 1))
    val segs = PdfLayout.assembleDoc("d1", toks.iterator).toVector
    assert(segs.length === 1) // same type, 4pt gap < 0.8*12 → one paragraph
    assert(segs.head.text === "hello world bottom row")
    assert(segs.head.segment_type === "TEXT")
  }

  test("bold large-font line becomes SECTION_HEADER and splits segments") {
    val toks =
      (0 to 7).map(s => tok(s"h$s", 0, s, font = 14, bold = true)) ++
        (0 to 7).map(s => tok(s"a$s", 1, s)) ++
        (0 to 7).map(s => tok(s"b$s", 2, s))
    val segs = PdfLayout.assembleDoc("d1", toks.iterator).toVector
    assert(segs.map(_.segment_type) === Vector("SECTION_HEADER", "TEXT"))
    assert(segs(1).text === (0 to 7).map(i => s"a$i").mkString(" ") + " " +
      (0 to 7).map(i => s"b$i").mkString(" "))
    // segment bbox is the token envelope
    assert(segs.head.left === 40.0 && segs.head.top === 60.0)
    assert(segs.head.width === 7 * 70.0 + 60.0)
  }

  test("large inter-line gap breaks a paragraph; pages never merge") {
    val toks = Seq(tok("para", 0, 0), tok("one", 0, 1),
      // line at 3× pitch → gap 36-12=24 > 0.8*12
      tok("para", 3, 0), tok("two", 3, 1),
      tok("next", 0, 0, page = 2), tok("page", 0, 1, page = 2))
    val segs = PdfLayout.assembleDoc("d1", toks.iterator).toVector
    assert(segs.map(_.text) === Vector("para one", "para two", "next page"))
    assert(segs.map(_.page_number) === Vector(1, 1, 2))
  }

  test("bullet first token makes the line LIST_ITEM; role maps to chunkable text") {
    val toks = Seq(tok("•", 0, 0), tok("item", 0, 1))
    val segs = PdfLayout.assembleDoc("d1", toks.iterator).toVector
    assert(segs.head.segment_type === "LIST_ITEM")
    // reader.py:253-258 — TEXT/LIST_ITEM/FORMULA chunk; headers are breaks;
    // page furniture is dropped like role "null" (reader.py:99)
    assert(PdfLayout.kindOf("LIST_ITEM") === Kinds.Text)
    assert(PdfLayout.kindOf("FORMULA") === Kinds.Text)
    assert(PdfLayout.kindOf("SECTION_HEADER") === Kinds.SectionHeader)
    assert(PdfLayout.kindOf("PAGE_FOOTER") === "page_furniture")
  }

  test("segments -> canonical DocRow spans in reading order, Spark path") {
    val toks =
      ((0 to 7).map(s => tok(s"head$s", 0, s, font = 14, bold = true)) ++
        // two body lines so the page-median font stays at body size
        (0 to 7).map(s => tok(s"body$s", 1, s)) ++
        (0 to 7).map(s => tok(s"more$s", 2, s)) ++
        (0 to 7).map(s => tok(s"p2tok$s", 0, s, page = 2))).toDS()
    val rows = PdfLayout.toDocRows(PdfLayout.segments(toks))
      .as[graft.core.DocRow].collect()
    assert(rows.length === 1)
    val spans = rows.head.spans
    assert(spans.map(_.offset) === spans.indices)
    assert(spans.map(_.kind) === Seq(Kinds.SectionHeader, Kinds.Text, Kinds.Text))
    assert(spans(1).text.startsWith("body0"))
  }

  test("F8 bbox: polygon under 6 coords -> null; swap + clamp + 300-DPI crop") {
    val df = Seq(
      (1, Seq(650.0, -10.0, 650.0, 100.0)),               // short → null
      (2, Seq(650.0, -10.0, 600.0, -10.0, 600.0, 100.0, 650.0, 100.0)), // x reversed, x>page, y<0
      (3, Seq(10.0, 20.0, 110.0, 20.0, 110.0, 820.0, 10.0, 820.0))      // y1 > page height
    ).toDF("id", "poly")
    val clamped = PdfLayout.clampBbox(
      PdfLayout.bboxFromPolygon(col("poly")), lit(612.0), lit(792.0))
    val out = df.select(col("id"), clamped.as("b"),
        PdfLayout.cropPixels(clamped).as("px"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).getSeq[Double](1) === Seq(600.0, 0.0, 612.0, 100.0))
    assert(out(2).getSeq[Double](1) === Seq(10.0, 20.0, 110.0, 792.0))
    assert(out(2).getSeq[Long](2) === Seq(3000L, 6000L, 33000L, 237600L))
  }

  test("S3 table -> markdown: grid placement, missing cell, last-write-wins, separator") {
    val df = Seq((1,
      Seq(TableCell(0, 0, "h1"), TableCell(0, 1, "h2"),
        TableCell(1, 1, "stale"), TableCell(1, 1, "b"), // duplicate → last wins
        TableCell(2, 0, "c")) // (1,0), (2,1) missing → ""
    )).toDF("id", "cells")
    val out = df.select(PdfLayout.tableContent(lit("Table 1"), lit(3), lit(2),
      col("cells")).as("content")).head.getString(0)
    // reference algorithm by hand (multi_modal_parser.py:196-228)
    assert(out ===
      "Table 1\n| h1 | h2 |\n| --- | --- |\n|  | b |\n| c |  |\n")
    // degenerate: zero rows → caption + empty markdown, no crash
    val empty = df.select(PdfLayout.tableContent(lit("T"), lit(0), lit(2),
      col("cells"))).head.getString(0)
    assert(empty === "T\n")
  }

  test("table markdown matches the reference loop on 40 random grids") {
    // pure twin of multi_modal_parser.py:196-228 (grid fill, last write
    // wins, header + --- separator, trailing newline per line)
    def expected(rows: Int, cols: Int, cells: Seq[TableCell]): String = {
      val grid = Array.fill(rows, cols)("")
      cells.foreach(c =>
        if (c.row_index < rows && c.column_index < cols)
          grid(c.row_index)(c.column_index) = c.content)
      (Seq(grid(0).toSeq, Seq.fill(cols)("---")) ++ grid.drop(1).map(_.toSeq))
        .map(r => "| " + r.mkString(" | ") + " |\n").mkString
    }
    val rnd = new scala.util.Random(42)
    val cases = (0 until 40).map { i =>
      val rows = 1 + rnd.nextInt(5)
      val cols = 1 + rnd.nextInt(4)
      val cells = Seq.fill(rnd.nextInt(12))(
        TableCell(rnd.nextInt(rows), rnd.nextInt(cols), s"w${rnd.nextInt(9)}"))
      (i, rows, cols, cells)
    }
    val got = cases.toDF("id", "rows", "cols", "cells")
      .select(col("id"), PdfLayout.tableMarkdown(col("rows"), col("cols"),
        col("cells")).as("md"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    cases.foreach { case (i, rows, cols, cells) =>
      assert(got(i) === expected(rows, cols, cells), s"case $i ($rows x $cols)")
    }
  }

  test("synthetic token corpus chunks end-to-end through the standard Chunker") {
    val docs = Seq(
      ("da", ("alpha " * 200).trim), ("db", ("beta " * 120).trim)
    ).toDF("doc_id", "text")
    val docRows = PdfLayout.toDocRows(
      PdfLayout.segments(PdfLayout.syntheticTokens(docs)))
    val chunks = graft.build.Chunker.chunks(
      docRows.as[graft.core.DocRow]).collect()
    assert(chunks.nonEmpty)
    assert(chunks.map(_.doc_id).distinct.sorted === Array("da", "db"))
    chunks.foreach(c => assert(c.token_num <= graft.build.Chunker.OptimalTokens + 120))
  }
}
