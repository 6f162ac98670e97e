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

  /** Number of BPE symbols a single pre-token encodes to. */
  private[functions] def encodedLength(piece: String): Int = {
    if (piece.isEmpty) return 0
    var symbols = piece.map(_.toString).toBuffer
    var done = false
    while (!done && symbols.length > 1) {
      // find the lowest-rank adjacent pair present in the vocabulary
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < symbols.length - 1) {
        val r = ranks.getOrElse((symbols(i), symbols(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val merged = symbols(bestIdx) + symbols(bestIdx + 1)
        symbols.update(bestIdx, merged)
        symbols.remove(bestIdx + 1)
      }
    }
    symbols.length
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

  /** Loaded once per JVM (driver and each executor read the same env). */
  @transient lazy val bpe: Option[BpeTokenizer] =
    sys.env.get(VocabEnv).map(BpeTokenizer.load)

  def count(text: String): Int = bpe match {
    case Some(b) => b.countTokens(text)
    case None => TextFns.estimateTokens(text)
  }
}
