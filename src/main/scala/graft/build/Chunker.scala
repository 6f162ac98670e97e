package graft.build

import graft.core._
import graft.functions.TextFns
import org.apache.spark.sql.{Dataset, SparkSession}

/** Chunk packing — the one order-dependent fold of the pipeline
  * (reference eschergraph/builder/reader/reader.py:93-154):
  *
  *   - spans sorted by `offset`; only `text` and `section_header` kinds
  *     feed chunks (tables/figures take the visual extraction path,
  *     reference build_pipeline.py:310-373);
  *   - accumulate span texts (joined "\n") until the 400-token budget is
  *     exceeded → emit chunk, monotone chunk_id;
  *   - force a break *before* a section_header span when the current chunk
  *     already holds > 0.7 × budget tokens;
  *   - post-filter: keep a chunk iff len >= 100 and non-alpha ratio
  *     (whitespace removed) <= 0.40 (reference reader.py:188-224).
  *
  * Expressed as a typed flatMap over the one-row-per-document input —
  * Catalyst-planned, zero shuffle; per-doc state is O(one chunk), so a
  * single document of any realistic size streams through without
  * materializing.
  */
object Chunker {
  val OptimalTokens = 400
  val HeaderBreakRatio = 0.7

  /** Pure per-doc fold, reused by tests and the Spark stage. */
  def packDoc(docId: String, spans: Iterator[Span]): Iterator[Chunk] = {
    val relevant = spans
      .filter(s => s.kind == Kinds.Text || s.kind == Kinds.SectionHeader)
      .toArray
      .sortBy(_.offset)
    val out = Vector.newBuilder[Chunk]
    val buf = new StringBuilder
    var bufTokens = 0
    var chunkId = 0
    def emit(): Unit = {
      if (buf.nonEmpty) {
        out += Chunk(docId, chunkId, buf.toString, bufTokens)
        chunkId += 1
        buf.clear()
        bufTokens = 0
      }
    }
    var i = 0
    while (i < relevant.length) {
      val s = relevant(i)
      // Tokens.count: estimator by default; exact BPE when a vocabulary
      // is configured (GRAFT_BPE_VOCAB) — the chunker consumes whichever
      // transparently, chunk boundaries follow the configured counter
      val t = graft.functions.Tokens.count(s.text)
      val headerBreak =
        s.kind == Kinds.SectionHeader && bufTokens > HeaderBreakRatio * OptimalTokens
      if (headerBreak || (bufTokens > 0 && bufTokens + t > OptimalTokens)) emit()
      if (buf.nonEmpty) buf.append('\n')
      buf.append(s.text)
      bufTokens += t
      i += 1
    }
    emit()
    out.result().iterator.filter(c => keep(c.text))
  }

  /** Chunk keep-filter (scala side; column twin is TextFns.chunkKeep). */
  def keep(text: String): Boolean = {
    if (text.length < 100) return false
    val noWs = text.filterNot(_.isWhitespace)
    if (noWs.isEmpty) return false
    val nonAlpha = noWs.count(c => !Character.isLetter(c) || c > 'z')
    nonAlpha.toDouble / noWs.length <= 0.4
  }

  /** The input table holds ONE row per document (input_hint: doc_id +
    * full span array), so packing is a narrow flatMap — zero shuffle. A
    * source that split a document's spans across rows would need a
    * groupByKey(doc_id) first; with the canonical table that shuffle
    * would move every span byte for nothing. */
  def chunks(docs: Dataset[DocRow]): Dataset[Chunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap(d => packDoc(d.doc_id, d.spans.iterator))
  }

  /** S1 TXT path — per-doc character-recursive split (reference
    * reader.py:156-186: strip, split 1500/300, filter, chunk_id = index in
    * the PRE-filter enumeration, so filtered-out chunks leave id gaps
    * exactly as the reference's `enumerate` + filter comprehension does). */
  def chunkTxtDoc(docId: String, raw: String, chunkSize: Int = 1500,
                  overlap: Int = 300): Iterator[Chunk] =
    TextSplitter.split(Option(raw).getOrElse("").strip(), chunkSize, overlap)
      .iterator.zipWithIndex
      .collect { case (t, i) if keep(t) =>
        Chunk(docId, i, t, graft.functions.Tokens.count(t)) }

  /** Spark stage for the TXT path: narrow flatMap over (doc_id, text)
    * rows — zero shuffle, same scale shape as the span-packing path. */
  def txtChunks(docs: org.apache.spark.sql.DataFrame, chunkSize: Int = 1500,
                overlap: Int = 300): Dataset[Chunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col("doc_id").cast("string"), col("text")).as[(String, String)]
      .flatMap { case (id, t) => chunkTxtDoc(id, t, chunkSize, overlap) }
  }

  /** Visual spans (tables + figures) routed to L5/L6 extraction. */
  def visualSpans(docs: Dataset[DocRow]): Dataset[(String, Span)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap(d =>
      d.spans.filter(s => s.kind == Kinds.Table || s.kind == Kinds.Figure).map(s => (d.doc_id, s)))
  }

  /** Full document text (reference reader.py:100-101): all chunkable spans
    * in offset order joined with "\n". Used for keywords/summary (L1/L2). */
  def fullTexts(docs: Dataset[DocRow]): Dataset[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map { d =>
      val txt = d.spans
        .filter(s => s.kind == Kinds.Text || s.kind == Kinds.SectionHeader)
        .sortBy(_.offset)
        .map(_.text)
        .mkString("\n")
      (d.doc_id, txt)
    }
  }
}
