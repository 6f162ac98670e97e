package graft.functions

/** Greedy byte-pair-encoding token counter over a merges vocabulary —
  * the optional exact stand-in for the estimator's word/char heuristic
  * (reference counts with tiktoken cl100k_base,
  * eschergraph/builder/reader/reader.py:226-238; the vocabulary itself is
  * an external artifact, so this loads ANY merges file of the standard
  * GPT-2 `merges.txt` shape: one `left right` pair per line in merge-
  * priority order, `#`-prefixed comment lines ignored).
  *
  * Encoding: text is pre-tokenized into runs (letters / digits /
  * other-punctuation, whitespace discarded — the "BPE-ish regex" split),
  * each run starts as its character sequence, and the lowest-rank
  * applicable merge is applied repeatedly until none applies (the
  * standard greedy BPE loop). The token count of the text is the sum of
  * surviving symbols. Deterministic, allocation-light, Serializable —
  * safe inside executors.
  *
  * Wiring: [[Tokens.count]] consults `GRAFT_BPE_VOCAB`; when the env
  * points at a readable merges file the chunker's token counts become
  * exact BPE counts transparently, otherwise the estimator heuristic
  * stands (the default, and what every DuckDB oracle mirrors — set the
  * env only for deployments, not verify runs). On a cluster, ship the
  * vocab to every executor (`spark-submit --files`) and point the env at
  * the shipped path. */
final class BpeTokenizer(ranks: Map[(String, String), Int]) extends Serializable {

  /** Number of BPE symbols a single pre-token encodes to.
    *
    * Linked symbols + a lazily-validated min-heap of merge candidates —
    * O(L log L) per piece, not the O(L²)–O(L³) of rescanning every
    * adjacent pair after each merge with Buffer.remove. The distinction
    * matters exactly where a counter meets real corpora: one long
    * unbroken alphanumeric run (a base64 / hex blob with no whitespace
    * is a single pre-token) must not stall the chunker hot path.
    * Semantics are unchanged: each step applies the lowest-rank pair,
    * leftmost on ties — the heap orders by (rank, left position) and a
    * popped candidate is applied only if its pair is still adjacent and
    * unmodified (stale entries are discarded on pop). */
  private[functions] def encodedLength(piece: String): Int = {
    val n = piece.length
    if (n == 0) return 0
    if (n == 1) return 1
    // doubly-linked symbol list over original character positions; a
    // merged symbol lives at its LEFT constituent's index, so heap
    // positions stay stable and left-to-right ordered across merges
    val sym = new Array[String](n)
    val prev = new Array[Int](n)
    val next = new Array[Int](n)
    var i = 0
    while (i < n) {
      sym(i) = String.valueOf(piece.charAt(i))
      prev(i) = i - 1
      next(i) = if (i == n - 1) -1 else i + 1
      i += 1
    }
    // candidate = (rank, leftIdx, leftSym, rightSym); ordering (rank, pos)
    final case class Cand(rank: Int, pos: Int, left: String, right: String)
    val heap = scala.collection.mutable.PriorityQueue.empty[Cand](
      Ordering.by((c: Cand) => (-c.rank, -c.pos)))
    def push(pos: Int): Unit = {
      val nx = next(pos)
      if (nx >= 0) ranks.get((sym(pos), sym(nx)))
        .foreach(r => heap.enqueue(Cand(r, pos, sym(pos), sym(nx))))
    }
    i = 0
    while (i < n - 1) { push(i); i += 1 }
    var count = n
    while (heap.nonEmpty && count > 1) {
      val c = heap.dequeue()
      val l = c.pos
      val r = next(l)
      // stale if either side was merged away or rewritten since enqueue
      if (sym(l) != null && r >= 0 && sym(l) == c.left && sym(r) == c.right) {
        sym(l) = c.left + c.right
        val rn = next(r)
        sym(r) = null
        next(l) = rn
        if (rn >= 0) prev(rn) = l
        count -= 1
        if (prev(l) >= 0) push(prev(l))
        push(l)
      }
    }
    count
  }

  private val Run = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+")

  /** Exact token count of `text` under this vocabulary. */
  def countTokens(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val m = Run.matcher(text)
    var n = 0
    while (m.find()) n += encodedLength(m.group())
    n
  }
}

object BpeTokenizer {

  /** Load a GPT-2-shaped merges file: `left right` per line, priority =
    * line order; blank and `#`-comment lines skipped. */
  def load(path: String): BpeTokenizer = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val ranks = src.getLines().map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .zipWithIndex
        .flatMap { case (line, rank) =>
          line.split(" ", 2) match {
            case Array(a, b) if a.nonEmpty && b.nonEmpty => Some((a, b) -> rank)
            case _ => None
          }
        }.toMap
      require(ranks.nonEmpty, s"no merges parsed from $path")
      new BpeTokenizer(ranks)
    } finally src.close()
  }
}

/** The engine's single token-counting seam: BPE-exact when a vocabulary
  * is configured, estimator heuristic otherwise. The chunker routes
  * through here, so a deployment flips to exact counts by setting one
  * env var — no code change, no plan change. */
object Tokens {
  val VocabEnv = "GRAFT_BPE_VOCAB"
  /** JVM-property twin of [[VocabEnv]] (`-Dgraft.bpe.vocab=...`): lets
    * BuildMain's `--bpe-vocab` flag and in-JVM tests configure the vocab
    * without an exec-time env var. On a multi-JVM cluster, set
    * `spark.executorEnv.GRAFT_BPE_VOCAB` (BuildMain's flag does) and ship
    * the file with `--files`. */
  val VocabProp = "graft.bpe.vocab"

  private def vocabPath: Option[String] =
    sys.props.get(VocabProp).orElse(sys.env.get(VocabEnv))

  // cache keyed by the resolved path so a JVM reuses one parsed tokenizer
  // but a test (or a re-submitted driver) that changes the property gets
  // the right vocabulary, not a stale lazy val
  private val cached =
    new java.util.concurrent.atomic.AtomicReference[(String, Option[BpeTokenizer])]()

  def bpe: Option[BpeTokenizer] = {
    val p = vocabPath.orNull
    val c = cached.get()
    if (c != null && c._1 == p) c._2
    else {
      val t = Option(p).map(BpeTokenizer.load)
      cached.set((p, t))
      t
    }
  }

  def count(text: String): Int = bpe match {
    case Some(b) => b.countTokens(text)
    case None => TextFns.estimateTokens(text)
  }
}
