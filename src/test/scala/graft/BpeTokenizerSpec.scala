package graft

import graft.functions.{BpeTokenizer, TextFns, Tokens}
import org.scalatest.funsuite.AnyFunSuite

/** Exact BPE token counting against the in-repo merges fixture, plus the
  * estimator fallback contract of the [[Tokens]] seam. */
class BpeTokenizerSpec extends AnyFunSuite {

  private lazy val bpe = BpeTokenizer.load(
    getClass.getResource("/bpe_merges_fixture.txt").getPath)

  test("greedy merge order yields exact counts") {
    // "the": t,h -> th (rank 0); th,e -> the (rank 1)  => 1 symbol
    assert(bpe.countTokens("the") === 1)
    // "lower": l,o -> lo; lo,w -> low; e,r -> er       => low + er = 2
    assert(bpe.countTokens("lower") === 2)
    assert(bpe.countTokens("the lower") === 3)
    // unknown word: no applicable merges, one symbol per char
    assert(bpe.countTokens("xyz") === 3)
    // "there": the + r,e (no merge: er rank exists but pair is (r,e)) ->
    // t,h,e,r,e => th,e,r,e => the,r,e => the + er? no — pair (r,e) has
    // no rank; (e,r) at positions 3-4 DOES: the,e?  walk it: after
    // the-merge symbols are [the, r, e]; (r,e) unranked => 3 symbols
    assert(bpe.countTokens("there") === 3)
  }

  test("pre-tokenization splits letters / digits / punctuation, discards whitespace") {
    // runs: "the" (1), "," (1), "lower" (2), "42" (2 digits, no merges), "!" (1)
    assert(bpe.countTokens("the, lower 42!") === 7)
    assert(bpe.countTokens("") === 0)
    assert(bpe.countTokens(null) === 0)
    assert(bpe.countTokens("   \n\t ") === 0)
  }

  test("heap-based merge loop matches the rescan reference on random pieces") {
    // the O(L log L) linked-symbol/heap implementation must be
    // step-for-step equivalent to the quadratic rescan loop it replaced:
    // lowest rank first, leftmost on ties
    def reference(ranks: Map[(String, String), Int], piece: String): Int = {
      var symbols = piece.map(_.toString).toBuffer
      var done = false
      while (!done && symbols.length > 1) {
        var bestRank = Int.MaxValue; var bestIdx = -1; var i = 0
        while (i < symbols.length - 1) {
          val r = ranks.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0) done = true
        else {
          symbols.update(bestIdx, symbols(bestIdx) + symbols(bestIdx + 1))
          symbols.remove(bestIdx + 1)
        }
      }
      symbols.length
    }
    val rnd = new scala.util.Random(42)
    // dense vocabulary over a tiny alphabet maximizes overlapping-merge
    // tie cases ("aaa…" chains) where ordering bugs would diverge
    val alpha = "ab"
    val pairs = for (a <- alpha; b <- alpha) yield (a.toString, b.toString)
    val vocab = rnd.shuffle(pairs.toVector).zipWithIndex.toMap ++
      Vector(("aa", "b"), ("ab", "ab"), ("ba", "a"), ("b", "ab")).zipWithIndex
        .map { case (p, i) => p -> (100 + i) }.toMap
    val tok = new BpeTokenizer(vocab)
    for (_ <- 1 to 300) {
      val len = 1 + rnd.nextInt(24)
      val s = Vector.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      // letters-only piece => one pre-token, so countTokens == encodedLength
      assert(tok.countTokens(s) === reference(vocab, s), s"piece: $s")
    }
  }

  test("one long unbroken alphanumeric run does not stall the counter") {
    // a base64/hex blob with no whitespace is a SINGLE pre-token; the
    // old rescan loop was O(L^2)+ here and stalled the chunker hot path
    val rnd = new scala.util.Random(7)
    // letters only: [A-Za-z]+ pre-tokenization keeps it ONE piece
    val blob = Vector.fill(200000)("abcdefghijklmnopqrstuvwxyz"(rnd.nextInt(26))).mkString
    val t0 = System.nanoTime()
    val n = bpe.countTokens(blob)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"200k-char run -> $n symbols in $secs%.2f s")
    assert(n > 0)
    assert(secs < 10.0, f"long-run counting stalled: $secs%.1f s")
  }

  test("merges file loader skips comments and blank lines, rejects empty vocab") {
    // the fixture itself carries a comment line — load() above succeeded
    val empty = java.nio.file.Files.createTempFile("bpe-empty", ".txt")
    java.nio.file.Files.writeString(empty, "# only comments\n\n")
    val e = intercept[IllegalArgumentException](BpeTokenizer.load(empty.toString))
    assert(e.getMessage.contains("no merges"))
  }

  test("Tokens.count falls back to the estimator when no vocabulary is configured") {
    assert(sys.env.get(Tokens.VocabEnv).isEmpty,
      "verify runs must not set GRAFT_BPE_VOCAB — oracles mirror the estimator")
    assert(Tokens.count("hello world this is text") ===
      TextFns.estimateTokens("hello world this is text"))
    assert(Tokens.count("") === 0)
  }
}
