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
