package graft

import graft.build.{Chunker, TextSplitter}
import graft.core._
import graft.functions.TextFns

/** Chunker invariants (mirrors reference tests/builder/test_reader.py:11-83). */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  def mkSpan(kind: String, text: String, off: Int) = Span(kind, text, "", off)

  test("chunk ids strictly increasing per doc; token budget respected") {
    val docs = Corpus.docs(spark, 30)
    val chunks = Chunker.chunks(docs).collect()
    chunks.groupBy(_.doc_id).foreach { case (_, cs) =>
      val ids = cs.map(_.chunk_id).sorted
      assert(ids.distinct.length === ids.length)
      // each chunk stays near the budget: a chunk only exceeds 400 tokens
      // if a single span did (packing emits before exceeding otherwise)
      cs.foreach(c => assert(c.token_num <= Chunker.OptimalTokens + 120,
        s"chunk ${c.doc_id}/${c.chunk_id} has ${c.token_num} tokens"))
    }
    assert(chunks.nonEmpty)
  }

  test("spans pack in offset order regardless of input order") {
    val spans = Seq(
      mkSpan(Kinds.Text, "B " * 60 + "second paragraph of the document text.", 1),
      mkSpan(Kinds.Text, "A " * 60 + "first paragraph of the document text.", 0))
    val out = Chunker.packDoc("d", spans.reverseIterator).toVector
    assert(out.head.text.startsWith("A "))
  }

  test("section header forces a break when chunk > 0.7 * budget") {
    val big = "word " * 300 // ~300 tokens > 0.7*400
    val spans = Seq(
      mkSpan(Kinds.Text, big.trim + " end of part one section.", 0),
      mkSpan(Kinds.SectionHeader, "Heading Two of this document", 1),
      mkSpan(Kinds.Text, "tail paragraph following the heading with enough characters to pass the length filter easily.", 2))
    val out = Chunker.packDoc("d", spans.iterator).toVector
    assert(out.size === 2)
    assert(out(1).text.startsWith("Heading Two"))
  }

  test("no break before header when chunk is small") {
    val spans = Seq(
      mkSpan(Kinds.Text, "short leading paragraph that stays well under the threshold for breaking here.", 0),
      mkSpan(Kinds.SectionHeader, "Heading Two of this document", 1),
      mkSpan(Kinds.Text, "tail paragraph following the heading with enough characters to pass the length filter easily.", 2))
    val out = Chunker.packDoc("d", spans.iterator).toVector
    assert(out.size === 1)
  }

  test("non-alpha / short chunks filtered (reference reader.py:188-224 cases)") {
    assert(!Chunker.keep("short"))
    assert(!Chunker.keep("1234567890 " * 20)) // all digits -> ratio 1.0
    assert(Chunker.keep("a perfectly normal english sentence repeated enough times to clear the hundred character floor easily."))
    // scala and column implementations agree on the corpus
    val texts = Corpus.docs(spark, 20).flatMap(_.spans.map(_.text)).toDF("text")
    import org.apache.spark.sql.functions.col
    val colKeep = texts.filter(TextFns.chunkKeep(col("text"))).count()
    val scalaKeep = texts.collect().map(_.getString(0)).count(Chunker.keep)
    assert(colKeep === scalaKeep)
  }

  test("tables and figures are excluded from chunks, routed to visual path") {
    val docs = Corpus.docs(spark, 20)
    val visual = Chunker.visualSpans(docs).collect()
    assert(visual.forall(v => v._2.kind == Kinds.Table || v._2.kind == Kinds.Figure))
    val chunkText = Chunker.chunks(docs).collect().map(_.text).mkString
    assert(!chunkText.contains("| subject | relation |"))
  }

  test("token estimator: scala and column forms agree") {
    val texts = Corpus.docs(spark, 10).flatMap(_.spans.map(_.text)).toDF("text")
    import org.apache.spark.sql.functions.col
    val viaCol = texts.select(TextFns.estimateTokensCol(col("text"))).collect().map(_.getInt(0))
    val viaScala = texts.collect().map(r => TextFns.estimateTokens(r.getString(0)))
    assert(viaCol.toSeq === viaScala.toSeq)
  }

  // ---- S1 TXT path: character-recursive splitter (reference
  // reader.py:156-186, tests/builder/test_reader.py:36-52) ----------------

  test("txt splitter: every chunk fits chunk_size; no content lost") {
    val para = (i: Int) => s"Paragraph number $i talks about entity alpha and " +
      s"entity beta collaborating on project gamma in considerable detail. " * 3
    val text = (0 until 12).map(para).mkString("\n\n")
    val chunks = TextSplitter.split(text, chunkSize = 800, overlap = 100)
    assert(chunks.nonEmpty)
    chunks.foreach(c => assert(c.length <= 800, s"chunk of ${c.length} chars"))
    // stripped concatenation preserves every non-whitespace character in order
    val flat = chunks.mkString.filterNot(_.isWhitespace)
    val orig = text.filterNot(_.isWhitespace)
    // overlap duplicates content, so flat is a supersequence; every chunk's
    // stripped text must occur verbatim in the original
    chunks.foreach(c => assert(orig.contains(c.filterNot(_.isWhitespace))))
    assert(flat.length >= orig.length)
  }

  test("txt splitter: consecutive chunks overlap by at most `overlap` chars") {
    val words = (0 until 600).map(i => s"w$i").mkString(" ")
    val chunks = TextSplitter.split(words, chunkSize = 200, overlap = 50)
    assert(chunks.length > 2)
    chunks.sliding(2).foreach { case Vector(a, b) =>
      // the start of b repeats the tail of a (window overlap), bounded by 50
      val maxShared = (1 to math.min(a.length, b.length))
        .filter(n => a.endsWith(b.take(n))).maxOption.getOrElse(0)
      assert(maxShared <= 50 + 10) // +word-boundary slack
      case _ => ()
    }
  }

  test("txt splitter: unsplittable runs degrade to finer separators down to chars") {
    val blob = "x" * 950 // no separators at all
    val chunks = TextSplitter.split(blob, chunkSize = 300, overlap = 30)
    assert(chunks.forall(_.length <= 300))
    assert(chunks.mkString.length >= 950) // chars preserved (with overlap >=)
    // newline-separated long lines split on the newline first
    val lines = Seq("a" * 250, "b" * 250, "c" * 250).mkString("\n")
    val byLine = TextSplitter.split(lines, chunkSize = 300, overlap = 30)
    assert(byLine.exists(_.contains("a" * 250)) && byLine.exists(_.contains("c" * 250)))
  }

  test("txt chunks: reference semantics — strip, filter, pre-filter chunk ids (gaps allowed)") {
    val good = ("The quick brown fox jumps over the lazy dog and keeps running through the long meadow. " * 4).trim
    val junk = "@@@ ### $$$ %%% ^^^ &&& *** ((( ))) !!! ~~~ ``` @@@ ### $$$ %%% ^^^ &&& *** ((( ))) !!! " * 3
    val text = s"  $good\n\n$junk\n\n$good  "
    val out = Chunker.chunkTxtDoc("d1", text, chunkSize = 400, overlap = 50).toVector
    assert(out.nonEmpty)
    // filtered chunks keep their pre-filter index: ids strictly increasing,
    // and at least one junk chunk was dropped (gap or shifted ids)
    val ids = out.map(_.chunk_id)
    assert(ids === ids.sorted && ids.distinct.length === ids.length)
    assert(out.forall(c => Chunker.keep(c.text)))
    val nSplits = TextSplitter.split(text.strip(), 400, 50).length
    assert(out.length < nSplits) // junk dropped
    assert(ids.max <= nSplits - 1)
  }

  test("txt chunks: Spark stage equals the per-doc function on the documents table") {
    val df = Seq(
      ("d0", ("Sentence about alpha and beta working together on gamma. " * 40).trim),
      ("d1", ""), // empty doc -> no chunks
      ("d2", ("Another document mentioning delta and epsilon at length. " * 35).trim)
    ).toDF("doc_id", "text")
    val viaSpark = Chunker.txtChunks(df).collect().toVector
      .sortBy(c => (c.doc_id, c.chunk_id))
    val direct = df.collect().toVector.flatMap(r =>
      Chunker.chunkTxtDoc(r.getString(0), r.getString(1))).sortBy(c => (c.doc_id, c.chunk_id))
    assert(viaSpark === direct)
    assert(viaSpark.nonEmpty && !viaSpark.exists(_.doc_id == "d1"))
  }

  test("estimator mirrors the reference cost/time formulas over the chunks table") {
    import graft.pipeline.Estimator
    // reference estimator.py:8-37 numbers: gpt-4o at 1M tokens ->
    // (5 + 15/4) * 2.5 = 21.875
    assert(Estimator.costIndication(1000000L, "gpt-4o") === 21.875)
    assert(Estimator.costIndication(1000000L, "gpt-4o-mini") === 0.75)
    intercept[IllegalArgumentException](Estimator.costIndication(1L, "nope"))
    // estimator.py:39-78: 10 chunks, gpt-4o -> ceil(10/2)*4 + 10*4 + 10*4 = 100 s
    assert(Estimator.timeIndication(10L, "gpt-4o") === "1.667 minutes")
    assert(Estimator.timeIndication(2L, "gpt-4o") === "20 seconds")
    val chunks = Seq(("d0", 0, "t", 120), ("d0", 1, "t", 80), ("d1", 0, "t", 50))
      .toDF("doc_id", "chunk_id", "text", "token_num")
    val e = Estimator.estimate(chunks, "gpt-4o")
    assert(e.numChunks === 3L && e.totalTokens === 250L)
    assert(e.estimatedCostUsd === Estimator.costIndication(250L, "gpt-4o"))
    assert(Estimator.render(e).contains("parse 3 chunks, analyze 250 tokens"))
  }
}
