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

  // layout tokens on a grid: distinct (page, line, slot) → distinct
  // coordinates, so reading order is unambiguous and permutation-invariance
  // is a hard property (ties in (top, left) would make stable-sort order
  // depend on arrival order, which a real extraction never produces for
  // distinct tokens)
  private val layoutTokensGen: Gen[List[graft.sources.PdfLayout.LayoutToken]] =
    for {
      n <- Gen.chooseNum(1, 50)
      cells <- Gen.listOfN(n, for {
        page <- Gen.chooseNum(1, 3)
        line <- Gen.chooseNum(0, 9)
        slot <- Gen.chooseNum(0, 7)
        w <- word
        bold <- Gen.frequency(4 -> false, 1 -> true)
      } yield ((page, line, slot), (w, bold)))
    } yield cells.toMap.toList.map { case ((page, line, slot), (w, bold)) =>
      graft.sources.PdfLayout.LayoutToken("d", page, 612, 792,
        line * 8 + slot, w, 40.0 + slot * 70.0, 60.0 + line * 16.0, 60.0,
        if (bold) 14.0 else 12.0, if (bold) 14.0 else 10.0, bold)
    }

  test("layout assembly: token preservation, reading order, permutation independence") {
    checkProp(Prop.forAll(layoutTokensGen) { toks =>
      import graft.sources.PdfLayout
      val segs = PdfLayout.assembleDoc("d", toks.iterator).toVector
      // every token's text appears in page segments exactly once, in
      // (top, left) order — nothing lost, nothing duplicated
      val preserved = toks.groupBy(_.page_number).forall { case (p, pt) =>
        val expected = pt.sortBy(t => (t.top, t.left)).map(_.text)
        val got = segs.filter(_.page_number == p).flatMap(_.text.split(" "))
        got == expected
      }
      // segments arrive in page order, and within a page by top
      val ordered = segs == segs.sortBy(s => (s.page_number, s.top, s.left))
      // arrival order must not matter
      val shuffled = new scala.util.Random(11).shuffle(toks)
      val stable = PdfLayout.assembleDoc("d", shuffled.iterator).toVector == segs
      // every segment bbox contains all its area: width/height non-negative
      val boxes = segs.forall(s => s.width >= 0 && s.height >= 0)
      preserved && ordered && stable && boxes
    }, tests = 150)
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
