package graft

import graft.build.Chunker
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
}
