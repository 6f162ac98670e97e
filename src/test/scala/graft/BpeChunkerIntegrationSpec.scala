package graft

import graft.build.Chunker
import graft.core._
import graft.functions.{BpeTokenizer, TextFns, Tokens}

/** End-to-end chunker run under the in-repo BPE merges fixture — the
  * integration gate for the `--bpe-vocab` / `GRAFT_BPE_VOCAB` deployment
  * story (README "Exact BPE token counts"): with the vocabulary
  * configured, every chunk the Spark stage emits must carry the EXACT
  * greedy-BPE token count of its text, and packing boundaries must move
  * accordingly; with it cleared, the estimator contract is restored.
  * Local mode shares the JVM, so the [[Tokens.VocabProp]] system property
  * reaches the executor-side fold — on a multi-JVM cluster the same seam
  * is fed by `spark.executorEnv.GRAFT_BPE_VOCAB` (BuildMain's flag sets
  * both).
  *
  * SEQUENTIAL-SUITE ASSUMPTION: this spec mutates the GLOBAL
  * [[Tokens.VocabProp]] system property that every other suite's Chunker
  * reads through Tokens. It is safe because the forked test JVM runs
  * suites sequentially (sbt's `Test / testForkedParallel` defaults to
  * false, and this build does not override it); enabling parallel forked
  * execution would require serializing access around the property
  * set/clear or these token counts become cross-suite flaky. */
class BpeChunkerIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val vocabPath = getClass.getResource("/bpe_merges_fixture.txt").getPath
  private lazy val bpe = BpeTokenizer.load(vocabPath)

  // unknown-to-the-fixture words: BPE counts every char as a symbol while
  // the estimator counts ~chars/4 — the budget fills ~4x faster, so the
  // SAME document must pack into more chunks under the fixture vocab
  private def docs() = {
    val para = (1 to 40).map(i => s"zqxjvk$i wpfghm$i").mkString(" ") + "."
    Seq(
      DocRow("bpe-doc-1", (0 until 6).map(o => Span(Kinds.Text, para, "", o))),
      DocRow("bpe-doc-2", (0 until 6).map(o => Span(Kinds.Text, para, "", o)))
    ).toDS()
  }

  private def withVocab[T](body: => T): T = {
    System.setProperty(Tokens.VocabProp, vocabPath)
    try body finally System.clearProperty(Tokens.VocabProp)
  }

  test("chunker emits exact BPE token counts end-to-end when the vocab is set") {
    val chunks = withVocab(Chunker.chunks(docs()).collect())
    assert(chunks.nonEmpty)
    chunks.foreach { c =>
      assert(c.token_num === bpe.countTokens(c.text),
        s"chunk ${c.doc_id}/${c.chunk_id}: stored token_num is not the exact BPE count")
    }
  }

  test("packing boundaries move with the counter; estimator contract restored after") {
    val withBpe = withVocab(Chunker.chunks(docs()).collect())
    val withEst = Chunker.chunks(docs()).collect()
    assert(withBpe.length > withEst.length,
      s"BPE-counted packing should emit more chunks (${withBpe.length} vs ${withEst.length})")
    withEst.foreach(c => assert(c.token_num === TextFns.estimateTokens(c.text)))
    // same text either way — only the boundaries (and hence the chunk
    // separators) differ, so compare whitespace-normalized
    def joined(cs: Array[graft.core.Chunk]) =
      cs.filter(_.doc_id == "bpe-doc-1").sortBy(_.chunk_id)
        .map(_.text).mkString(" ").replaceAll("\\s+", " ")
    assert(joined(withBpe) === joined(withEst))
  }
}
