package graft.ops

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All are narrow
  * per-row projections built from codegen'd built-ins (no shuffle, fully
  * pushdown-friendly); only language ID uses a scalar UDF over a small
  * static profile table.
  */
object TextAnalysis {

  /** Stopword list used by the quality score (fixed, shared with oracle SQL). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Quality features per document:
    * n_words, n_chars, avg_word_len, stopword_ratio, non_alpha_ratio,
    * all ratios rounded to 4 decimals (shared rounding with the oracle).
    * Words are NON-EMPTY \s+ split pieces — `split(trim(..))` would count
    * 1 word for an empty document and a phantom token after a leading tab
    * (trim strips only ASCII spaces). Empty documents report n_words=0 and
    * 0.0 ratios on both the engine and oracle sides. Stopword membership
    * uses the Column API, not an interpolated SQL string — a column name
    * needing backticks would break an `expr(...)` form. */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = filter(split(lower(col(textCol)), "\\s+"), w => w =!= "")
    val nWords = size(words)
    val nStop = size(filter(words, w => w.isInCollection(Stopwords)))
    def ratio(num: Column): Column =
      when(nWords === 0, lit(0.0)).otherwise(round(num.cast("double") / nWords, 4))
    df.select(
      col(idCol).as("id"),
      nWords.cast("long").as("n_words"),
      length(col(textCol)).cast("long").as("n_chars"),
      ratio(length(regexp_replace(col(textCol), "\\s+", ""))).as("avg_word_len"),
      ratio(nStop).as("stopword_ratio"),
      round(TextFns.nonAlphaRatioCol(col(textCol)), 4).as("non_alpha_ratio"))
  }

  /** Token count (the engine's deterministic estimator, F2). */
  def tokenCount(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      TextFns.estimateTokensCol(col(textCol)).cast("long").as("n_tokens"))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup / provenance key. */
  def fingerprintCol(textCol: Column): Column =
    md5(regexp_replace(trim(lower(textCol)), "\\s+", " "))

  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), fingerprintCol(col(textCol)).as("fingerprint"))

  /** Language-ID heuristic: character/stopword n-gram profiles for a small
    * language set; returns best-scoring language with its score. Profiles
    * are tiny and ship in the closure (broadcast-by-value). */
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "with"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es" -> Set("el", "la", "de", "que", "y", "es", "en", "los"),
    "fr" -> Set("le", "la", "de", "et", "est", "les", "des", "une"),
    "zh" -> Set.empty) // CJK detected by script, not stopwords

  private val langUdf = udf((t: String) => {
    if (t == null || t.isEmpty) "und"
    else {
      val cjk = t.count(c => Character.UnicodeScript.of(c) == Character.UnicodeScript.HAN)
      if (cjk > t.length / 10) "zh"
      else {
        val toks = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
        if (toks.isEmpty) "und"
        else {
          val scores = profiles.collect { case (l, sw) if sw.nonEmpty =>
            l -> toks.count(sw.contains).toDouble / toks.length
          }
          val (best, sc) = scores.maxBy { case (l, s) => (s, l) }
          if (sc == 0.0) "und" else best
        }
      }
    }
  })

  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), langUdf(col(textCol)).as("lang_pred"))
}
