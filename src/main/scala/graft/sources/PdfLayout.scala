package graft.sources

import graft.core.Kinds
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S2 — PDF layout-analysis source, and F8 — bounding-box clamp/crop math.
  *
  * The reference parses PDFs with Poppler XML → a LightGBM token-type
  * model → a LightGBM paragraph-extraction model → typed segments
  * (`builder/reader/fast_pdf_parser/parser.py:86-139`), then maps segment
  * type → chunkable role (`builder/reader/reader.py:241-265`). The ML
  * models are external binary artifacts (downloaded from HF at runtime,
  * `parser.py:142-166`) and are NOT in this container, so the per-token
  * CLASSIFIER here is a clearly-marked deterministic geometric stand-in —
  * but everything Spark owns is real and tested: the layout-token table
  * schema (exactly what Poppler's pdftohtml XML yields), the distributed
  * one-shuffle-per-doc segment assembly (line build → paragraph build →
  * typed segments in reading order), the `PdfParsedSegment`-shaped output
  * (`parser.py:129-139`), and the role mapping into the engine's canonical
  * span table so the assembled document flows straight into [[graft.build.Chunker]].
  *
  * Scale shape: tokens arrive as a flat table (doc_id, page, geometry,
  * text…) — at 10^12 documents that is the natural Iceberg layout of an
  * upstream Poppler extraction. Assembly groups by doc_id only (ONE
  * shuffle, the same key every downstream stage uses); per-group state is
  * one document's tokens — bounded by document size, never by corpus.
  */
object PdfLayout {

  /** One Poppler-extracted text token (pdftohtml -xml <text> element). */
  case class LayoutToken(doc_id: String, page_number: Int, page_width: Double,
                         page_height: Double, token_index: Int, text: String,
                         left: Double, top: Double, width: Double,
                         height: Double, font_size: Double, bold: Boolean)

  /** Mirror of the reference's PdfParsedSegment (parser.py:129-139,
    * models.py:6-18). */
  case class ParsedSegment(doc_id: String, left: Double, top: Double,
                           width: Double, height: Double, page_number: Int,
                           page_width: Int, page_height: Int, text: String,
                           segment_type: String)

  // ----- token-type classification (LightGBM seam + geometric stub) -----

  private val Bullet = "^(?:[\\u2022\\u25cf*\\-]|\\(?\\d{1,2}[.)])\\s*".r
  private val Formulaish = "[=^∑∫±≤≥√]".r

  /** The reference's TokenType enum order — `TokenType.from_index` maps a
    * model's class index through exactly this list
    * (`pdf_document_layout_analysis/pdf_token_type_labels/token_type.py`),
    * so a deployer-trained token-type model uses the same convention. */
  val TokenTypeLabels: Vector[String] = Vector(
    "FORMULA", "FOOTNOTE", "LIST_ITEM", "TABLE", "PICTURE", "TITLE",
    "TEXT", "PAGE_HEADER", "SECTION_HEADER", "CAPTION", "PAGE_FOOTER")

  /** Env-pointed LightGBM models for the two learned pieces of the
    * reference's PDF parser (`fast_pdf_parser/parser.py:86-123`): token
    * typing and paragraph (segment-boundary) extraction. Unset env vars →
    * the deterministic geometric stand-ins below; set → real inference via
    * [[LightGbmModel]] (text-format models; ship the files to a cluster
    * with `spark-submit --files`, mirroring the `GRAFT_BPE_VOCAB` seam).
    *
    * Feature-vector contracts (what a deployer trains against):
    *  - token-type, multiclass over [[TokenTypeLabels]] order:
    *    `[font_size, font_size/pageMedianFont, bold, left, top, width,
    *      height, textLen, startsWithBullet, hasFormulaChar]`
    *  - paragraph, single-output merge score (> 0 merges the line into the
    *    current segment, <= 0 starts a new one):
    *    `[gap, prevLineHeight, gap/prevLineHeight, sameLineType,
    *      page_number]`
    */
  case class PdfModels(tokenType: Option[LightGbmModel],
                       paragraph: Option[LightGbmModel])

  object PdfModels {
    val TokenModelEnv = "GRAFT_PDF_TOKEN_MODEL"
    val ParaModelEnv = "GRAFT_PDF_PARA_MODEL"
    /** Fail LOUDLY on a model trained against a different feature/class
      * contract than this seam's (the seam's promise): Tree.score
      * zero-fills any feature index beyond the caller's vector, so a
      * wider-contract artifact (e.g. the reference's huridocs models,
      * which read dozens of features) would otherwise produce silently
      * wrong classifications instead of an error naming the mismatch. */
    private[graft] def validated(m: Option[LightGbmModel], what: String,
                                 nFeatures: Int, wantClasses: Option[Int]): Option[LightGbmModel] =
      m.map { model =>
        require(model.maxFeatureIdx < nFeatures,
          s"$what model reads feature index ${model.maxFeatureIdx} but this seam's " +
          s"$what feature vector has exactly $nFeatures entries (contract documented " +
          s"on PdfModels) — the supplied artifact was trained against a different " +
          s"feature set and would score garbage; train against the documented vector")
        wantClasses.foreach { nc =>
          require(model.numClass == nc,
            s"$what model has num_class=${model.numClass} but this seam expects $nc " +
            s"(TokenTypeLabels order, documented on PdfModels) — wrong artifact")
        }
        model
      }
    /** Resolved lazily PER JVM — [[segments]] references it inside the
      * flatMapGroups lambda, so executors load from their local copy. */
    lazy val fromEnv: PdfModels = PdfModels(
      validated(LightGbmModel.fromEnv(TokenModelEnv), "token-type",
        nFeatures = 10, wantClasses = Some(TokenTypeLabels.length)),
      validated(LightGbmModel.fromEnv(ParaModelEnv), "paragraph",
        nFeatures = 5, wantClasses = Some(1)))
    val none: PdfModels = PdfModels(None, None)
  }

  private def tokenFeatures(t: LayoutToken, pageMedianFont: Double): Array[Double] = Array(
    t.font_size,
    if (pageMedianFont > 0) t.font_size / pageMedianFont else 1.0,
    if (t.bold) 1.0 else 0.0,
    t.left, t.top, t.width, t.height,
    t.text.length.toDouble,
    if (Bullet.findPrefixOf(t.text).isDefined) 1.0 else 0.0,
    if (Formulaish.findFirstIn(t.text).isDefined) 1.0 else 0.0)

  /** Deterministic stand-in for the LightGBM token-type model: geometry +
    * typography heuristics over the same features the real model reads
    * (font size vs page median, bold flag, charset). The model seam
    * ([[PdfModels]]) swaps in a real scorer; everything downstream is
    * agnostic to how the type was produced. */
  def classifyToken(t: LayoutToken, pageMedianFont: Double,
                    model: Option[LightGbmModel] = None): String =
    model match {
      case Some(m) =>
        // out-of-range class index falls back to TEXT — the reference's
        // TokenType.from_index convention; clamping to the LAST label
        // (PAGE_FOOTER) both diverged from it and hid a num_class
        // mismatch. PdfModels.fromEnv additionally rejects such a model
        // at load time; the fallback covers direct callers.
        val i = m.predictClass(tokenFeatures(t, pageMedianFont))
        if (i >= 0 && i < TokenTypeLabels.length) TokenTypeLabels(i) else "TEXT"
      case None =>
        if (t.bold && t.font_size >= 1.15 * pageMedianFont) "SECTION_HEADER"
        else if (Bullet.findPrefixOf(t.text).isDefined) "LIST_ITEM"
        else if (Formulaish.findFirstIn(t.text).isDefined) "FORMULA"
        else "TEXT"
    }

  // ----- segment assembly (STUB-geometry analog of the paragraph model) --

  /** Assemble one document's tokens into typed segments — the pure fold
    * the Spark stage and the tests share.
    *
    * Reading order: per page, tokens sort by (top, left); a token starts a
    * new LINE when it no longer vertically overlaps the current line
    * (top ≥ line bottom − 0.3×height); lines merge into a SEGMENT while
    * the inter-line gap stays under 0.8× the previous line's height and
    * the line type is unchanged. Line type = LIST_ITEM if the first token
    * is a bullet, else the majority token type (ties → earliest). These
    * thresholds are the deterministic stand-in for the paragraph model's
    * learned boundaries. */
  def assembleDoc(docId: String, tokens: Iterator[LayoutToken],
                  models: PdfModels = PdfModels.none): Iterator[ParsedSegment] = {
    val byPage = tokens.toArray.groupBy(_.page_number).toArray.sortBy(_._1)
    val out = Vector.newBuilder[ParsedSegment]
    for ((page, toks) <- byPage) {
      val sortedFonts = toks.map(_.font_size).sorted
      val medianFont = sortedFonts(sortedFonts.length / 2)
      val sorted = toks.sortBy(t => (t.top, t.left))

      // lines
      val lines = Vector.newBuilder[Array[LayoutToken]]
      var cur = Vector.newBuilder[LayoutToken]
      var curBottom = Double.NegativeInfinity
      var curEmpty = true
      for (t <- sorted) {
        if (!curEmpty && t.top >= curBottom - 0.3 * t.height) {
          lines += cur.result().toArray.sortBy(_.left)
          cur = Vector.newBuilder[LayoutToken]; curEmpty = true
          curBottom = Double.NegativeInfinity
        }
        cur += t; curEmpty = false
        curBottom = math.max(curBottom, t.top + t.height)
      }
      if (!curEmpty) lines += cur.result().toArray.sortBy(_.left)

      def lineType(l: Array[LayoutToken]): String =
        if (models.tokenType.isEmpty && Bullet.findPrefixOf(l.head.text).isDefined) "LIST_ITEM"
        else {
          val types = l.map(classifyToken(_, medianFont, models.tokenType))
          types.groupBy(identity).toArray
            .map { case (ty, g) => (ty, g.length, types.indexOf(ty)) }
            .minBy { case (_, n, first) => (-n, first) }._1
        }
      def bottom(l: Array[LayoutToken]) = l.map(t => t.top + t.height).max
      def height(l: Array[LayoutToken]) = l.map(_.height).max

      // segments
      var seg = Vector.empty[Array[LayoutToken]]
      var segType = ""
      def flush(): Unit = if (seg.nonEmpty) {
        val all = seg.flatten
        val (x0, y0) = (all.map(_.left).min, all.map(_.top).min)
        val (x1, y1) = (all.map(t => t.left + t.width).max, all.map(t => t.top + t.height).max)
        out += ParsedSegment(docId, x0, y0, x1 - x0, y1 - y0, page,
          all.head.page_width.toInt, all.head.page_height.toInt,
          seg.map(_.map(_.text).mkString(" ")).mkString(" "), segType)
        seg = Vector.empty
      }
      for (l <- lines.result()) {
        val ty = lineType(l)
        // boundary decision: the paragraph model scores merge-vs-break
        // when present (feature contract in [[PdfModels]]); otherwise the
        // geometric stand-in (same type + gap under 0.8x previous height)
        val break = seg.nonEmpty && (models.paragraph match {
          case Some(m) =>
            val gap = l.head.top - bottom(seg.last)
            val ph = height(seg.last)
            !m.predictBinary(Array(gap, ph, if (ph > 0) gap / ph else 0.0,
              if (ty == segType) 1.0 else 0.0, page.toDouble))
          case None =>
            ty != segType || l.head.top - bottom(seg.last) > 0.8 * height(seg.last)
        })
        if (break) flush()
        if (seg.isEmpty) segType = ty
        seg = seg :+ l
      }
      flush()
    }
    out.result().iterator
  }

  /** Spark stage: flat token table → typed segments, one doc-keyed
    * shuffle. [[PdfModels.fromEnv]] resolves INSIDE the lambda, i.e. on
    * the executor from its local model files, once per JVM. */
  def segments(tokens: Dataset[LayoutToken]): Dataset[ParsedSegment] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.groupByKey(_.doc_id)
      .flatMapGroups((id, it) => assembleDoc(id, it, PdfModels.fromEnv))
  }

  /** Segment type → canonical span kind, mirroring the reference's role
    * mapping (reader.py:253-258: TEXT/LIST_ITEM/FORMULA → chunkable,
    * SECTION_HEADER → sectionHeading) plus the multimodal kinds; anything
    * else (page furniture) gets a kind the Chunker ignores — the analog of
    * role "null" being skipped at reader.py:99. */
  def kindOf(segmentType: String): String = segmentType match {
    case "TEXT" | "LIST_ITEM" | "FORMULA" => Kinds.Text
    case "SECTION_HEADER"                 => Kinds.SectionHeader
    case "TABLE"                          => Kinds.Table
    case "PICTURE" | "FIGURE"             => Kinds.Figure
    case _                                => "page_furniture"
  }

  /** Column twin of [[kindOf]] — chained `when`s keep the projection
    * inside whole-stage codegen (no UDF). */
  def kindCol(segmentType: Column): Column =
    when(segmentType.isin("TEXT", "LIST_ITEM", "FORMULA"), Kinds.Text)
      .when(segmentType === "SECTION_HEADER", Kinds.SectionHeader)
      .when(segmentType === "TABLE", Kinds.Table)
      .when(segmentType.isin("PICTURE", "FIGURE"), Kinds.Figure)
      .otherwise("page_furniture")

  /** Segments → the canonical input table rows (doc_id, spans) of
    * BASELINE.json's input_hint, offsets = reading order. From here the
    * standard pipeline (Chunker → extraction → …) takes over. */
  def toDocRows(segs: Dataset[ParsedSegment]): DataFrame = {
    val spark = segs.sparkSession
    import spark.implicits._
    segs
      // reading order without a per-doc sort-shuffle: order key packs
      // (page, top, left) into one sortable struct; array_sort after the
      // doc-local collect keeps the whole thing a single doc-keyed agg.
      .withColumn("ord", struct(col("page_number"), col("top"), col("left")))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("ord"), col("text"),
        kindCol(col("segment_type")).as("kind")))).as("ordered"))
      .select(col("doc_id"),
        expr("transform(ordered, (s, i) -> struct(s.kind as kind, s.text as text, " +
          "cast(null as string) as media_ref, cast(i as int) as offset))").as("spans"))
  }

  /** Deterministic layout-token table derived from a (doc_id, text)
    * corpus — the stand-in for a real Poppler extraction, used by tests
    * and the driver query. US-letter page (612×792 pt), 8 tokens per
    * 16-pt line, 40 lines per page; every 7th line's first token is bold
    * at 14 pt so the classifier stub yields SECTION_HEADER runs. */
  def syntheticTokens(docs: DataFrame, maxTokens: Int = 160): Dataset[LayoutToken] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("string"), col("text")).as[(String, String)]
      .flatMap { case (id, text) =>
        Option(text).getOrElse("").split("\\s+").iterator.filter(_.nonEmpty)
          .take(maxTokens).zipWithIndex.map { case (w, i) =>
            val line = i / 8
            val headerLine = line % 7 == 0 // whole line bold → header segment
            LayoutToken(id, line / 40 + 1, 612, 792,
              token_index = i, text = w,
              left = 40.0 + (i % 8) * 70.0, top = 60.0 + (line % 40) * 16.0,
              width = 60.0, height = if (headerLine) 14.0 else 12.0,
              font_size = if (headerLine) 14.0 else 10.0, bold = headerLine)
          }
      }
  }

  // ----- F8: bounding-box clamp / crop math (pure Catalyst columns) ------

  /** Polygon → bbox (multi_modal_parser.py:152-165): needs ≥ 6 coords;
    * bbox = [p0, p1, p4, p5] (x0,y0 = first vertex; x1,y1 = third). */
  def bboxFromPolygon(poly: Column): Column =
    when(poly.isNull || size(poly) < 6, lit(null))
      .otherwise(array(element_at(poly, 1), element_at(poly, 2),
        element_at(poly, 5), element_at(poly, 6)))

  /** Order-normalize + clamp to the page (multi_modal_parser.py:284-297):
    * swap reversed coordinate pairs, then clamp each into [0, page dim]. */
  def clampBbox(bbox: Column, pageW: Column, pageH: Column): Column = {
    def cl(v: Column, hi: Column) = greatest(lit(0.0), least(v, hi))
    when(bbox.isNull, lit(null)).otherwise(array(
      cl(least(element_at(bbox, 1), element_at(bbox, 3)), pageW),
      cl(least(element_at(bbox, 2), element_at(bbox, 4)), pageH),
      cl(greatest(element_at(bbox, 1), element_at(bbox, 3)), pageW),
      cl(greatest(element_at(bbox, 2), element_at(bbox, 4)), pageH)))
  }

  /** S3 — table → markdown render (multi_modal_parser.py:196-228): place
    * cells into a row_count × column_count grid (missing cells stay "",
    * duplicate (row, col) cells last-write-wins like the reference's
    * overwriting loop), then emit header row, `---` separator, body rows —
    * each line `| a | b |\n`. Pure higher-order-function columns: codegen
    * projection, no UDF, no shuffle.
    *
    * Rows with row_count < 1 yield "" (the reference raises on its
    * `markdown_table[0]` — no output exists for them either). */
  def tableMarkdown(rowCount: Column, colCount: Column, cells: Column): Column = {
    val grid = transform(sequence(lit(0), rowCount - 1), r =>
      transform(sequence(lit(0), colCount - 1), c =>
        coalesce(
          get(reverse(filter(cells, x =>
            x.getField("row_index") === r && x.getField("column_index") === c)), lit(0))
            .getField("content"),
          lit(""))))
    def line(row: Column) = concat(lit("| "), array_join(row, " | "), lit(" |\n"))
    val sep = concat(lit("| "),
      array_join(transform(sequence(lit(0), colCount - 1), _ => lit("---")), " | "),
      lit(" |\n"))
    val body = array_join(
      transform(slice(grid, lit(2), greatest(size(grid) - 1, lit(0))), r => line(r)), "")
    when(rowCount >= 1 && colCount >= 1,
      concat(line(element_at(grid, 1)), sep, body)).otherwise(lit(""))
  }

  /** Visual-element content for a table (multi_modal_parser.py:93-96):
    * caption + "\n" + markdown. */
  def tableContent(caption: Column, rowCount: Column, colCount: Column,
                   cells: Column): Column =
    concat(coalesce(caption, lit("")), lit("\n"),
      tableMarkdown(rowCount, colCount, cells))

  /** 300-DPI crop rectangle in pixels (multi_modal_parser.py:299-305): the
    * reference scales point coords ×72 into its crop box and renders with
    * a 300/72 matrix — net ×300 per coordinate; we mirror that net factor
    * exactly (quirk and all) so crop dimensions match. */
  def cropPixels(clamped: Column, dpi: Int = 300): Column =
    when(clamped.isNull, lit(null)).otherwise(
      transform(clamped, c => round(c * dpi).cast("long")))
}
