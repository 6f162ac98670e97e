package graft

import graft.build.Chunker
import graft.core.{Kinds, Span}
import graft.functions.TextFns
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (ScalaCheck) for the pure kernels — the
  * reference's test style is randomized structural invariants
  * (tests/graph/help.py uses Faker); these are the strict version. */
class PropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop, tests: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests).withInitialSeed(42L), p)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "longishword",
    "Vertex", "Analytics", "the", "of")
  private val text = Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("tokenSetRatio: range, symmetry, identity") {
    checkProp(Prop.forAll(text, text) { (a, b) =>
      val r = TextFns.tokenSetRatio(a, b)
      r >= 0 && r <= 100 &&
        r == TextFns.tokenSetRatio(b, a) &&
        TextFns.tokenSetRatio(a, a) == 100
    })
  }

  test("tokenSetRatio: token-subset pairs score 100 (blocking threshold property)") {
    checkProp(Prop.forAll(text, word) { (a, extra) =>
      // superset token set: same tokens plus one more -> subset rule fires
      TextFns.tokenSetRatio(a, a + " " + extra) == 100
    })
  }

  private val spansGen: Gen[List[Span]] =
    Gen.listOf(for {
      kind <- Gen.frequency(6 -> Kinds.Text, 2 -> Kinds.SectionHeader,
        1 -> Kinds.Table, 1 -> Kinds.Figure)
      t <- text
    } yield Span(kind, t, "", 0))
      .map(_.zipWithIndex.map { case (s, i) => s.copy(offset = i) })

  test("chunker: dense monotone ids, token budget, span-order independence") {
    checkProp(Prop.forAll(spansGen) { spans =>
      val chunks = Chunker.packDoc("d", spans.iterator).toVector
      val idsOk = chunks.map(_.chunk_id) == chunks.indices.toVector
      // the packer emits before appending when the budget would overflow,
      // so any over-budget chunk is a single oversized span
      val budgetOk = chunks.forall { c =>
        c.token_num <= Chunker.OptimalTokens || !c.text.contains('\n')
      }
      val shuffled = new scala.util.Random(7).shuffle(spans)
      val same = Chunker.packDoc("d", shuffled.iterator).toVector == chunks
      idsOk && budgetOk && same
    }, tests = 100)
  }

  test("simhash is a bag-of-words hash: token permutation leaves it unchanged") {
    checkProp(Prop.forAll(text) { t =>
      val perm = new scala.util.Random(3).shuffle(t.split(" ").toSeq).mkString(" ")
      TextFns.simhash64(t) == TextFns.simhash64(perm)
    })
  }

  test("minhash containment: signature minima never increase when the shingle set grows") {
    val multiword = Gen.chooseNum(2, 60).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    checkProp(Prop.forAll(multiword, multiword) { (a, b) =>
      // "a b" starts with a's (>= k tokens) run, so its shingle set is a
      // superset of a's; each per-permutation minimum can only decrease
      val sa = TextFns.minhash(a, 2, 16)
      val sab = TextFns.minhash(a + " " + b, 2, 16)
      sab.zip(sa).forall { case (s, x) => s <= x }
    })
  }
}
