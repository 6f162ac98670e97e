package graft.ops

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication family for large-scale training-data pipelines.
  *
  * All near-dup variants follow the same scale shape: per-doc feature →
  * compact blocking key (band / bucket) → equi-join on the key → exact
  * verification on the candidate pairs only. Nothing here is O(n²) in docs;
  * the joins shuffle on blocking keys whose fan-out we bound explicitly
  * (`maxShingleDf`), which is the knob that keeps candidate generation
  * linear when a shingle is stop-word-common at 100 TB.
  */
object Dedup {

  /** Exact dedup: hash-groupBy, canonical survivor = min id.
    * Returns (id, content_hash, group_size, keep). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    df.select(col(idCol).as("id"), h.as("content_hash"))
      .withColumn("group_size", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))))
      .withColumn("keep", col("id") === min(col("id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))))
  }

  private val shinglesUdf = udf((t: String, k: Int) => TextFns.shingles(t, k).distinct)
  private val minhashUdf = udf((t: String, k: Int, p: Int) => TextFns.minhash(t, k, p))
  private val simhashUdf = udf((t: String) => TextFns.simhash64(t))
  private val hammingUdf = udf((a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))

  /** Exact n-gram (word k-shingle) Jaccard near-dup pairs >= threshold.
    *
    * Blocked self-join on shingles: candidate pair volume is
    * sum(df(shingle)^2); shingles more frequent than `maxShingleDf` docs are
    * excluded from *candidate generation* (a pair that only shares
    * ultra-common shingles cannot reach a high Jaccard), but set sizes for
    * the Jaccard denominator always use the full shingle sets, so reported
    * similarities are exact. Pass maxShingleDf=0 to disable the cap (small
    * data / oracle-parity mode). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.8,
                        maxShingleDf: Long = 0L): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shinglesUdf(col(textCol), lit(k)).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val ex = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("g"))
    val blocked =
      if (maxShingleDf > 0) {
        val hot = ex.groupBy("g").agg(count(lit(1)).as("df_g"))
          .filter(col("df_g") > maxShingleDf).select("g")
        ex.join(broadcast(hot), Seq("g"), "left_anti")
      } else ex
    val a = blocked.select(col("g"), col("id").as("ida"), col("n_sh").as("na"))
    val b = blocked.select(col("g").as("g2"), col("id").as("idb"), col("n_sh").as("nb"))
    a.join(b, col("g") === col("g2") && col("ida") < col("idb"))
      .groupBy(col("ida"), col("idb"))
      .agg(count(lit(1)).as("inter"), first(col("na")).as("na"), first(col("nb")).as("nb"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash + LSH near-dup candidates, verified with exact Jaccard.
    * signature → `bands` bands of numPerm/bands rows each → band-hash
    * equi-join → exact verification restricted to candidates. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, numPerm: Int = 16, bands: Int = 4,
                      threshold: Double = 0.8): DataFrame = {
    val rows = numPerm / bands
    val txt = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val sig = df.select(col(idCol).as("id"),
      minhashUdf(col(textCol), lit(k), lit(numPerm)).as("sig"))
    // band value = hash of its slice of the signature; candidates carry only
    // (band, bh, id) — texts rejoin after the pair-distinct, so the heavy
    // payload never rides the candidate shuffle
    val withBands = sig.select(col("id"),
      explode(expr(s"transform(sequence(0, ${bands - 1}), b -> struct(b as band, hash(slice(sig, b*$rows+1, $rows)) as bh))")).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))
    val l = withBands.select(col("band"), col("bh"), col("id").as("ida"))
    val r = withBands.select(col("band").as("band2"), col("bh").as("bh2"), col("id").as("idb"))
    val cands = l.join(r, col("band") === col("band2") && col("bh") === col("bh2") && col("ida") < col("idb"))
      .select("ida", "idb").distinct()
      .join(txt.select(col("id").as("ida"), col("text").as("ta")), Seq("ida"))
      .join(txt.select(col("id").as("idb"), col("text").as("tb")), Seq("idb"))
    val jacc = udf((a: String, b: String) => {
      val sa = TextFns.shingles(a, k).toSet
      val sb = TextFns.shingles(b, k).toSet
      if (sa.isEmpty && sb.isEmpty) 1.0
      else (sa intersect sb).size.toDouble / (sa union sb).size
    })
    cands.withColumn("jaccard", round(jacc(col("ta"), col("tb")), 4))
      .filter(col("jaccard") >= threshold)
      .select("ida", "idb", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit simhash, blocked by 4 x 16-bit bands
    * (any pair within Hamming distance 3 must agree on >= 1 band), verified
    * by exact Hamming distance. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhashUdf(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(expr("transform(sequence(0, 3), b -> struct(b as band, shiftright(sig, b*16) & 65535 as bv))")).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bv"))
    val l = banded.select(col("band"), col("bv"), col("id").as("ida"), col("sig").as("sa"))
    val r = banded.select(col("band").as("band2"), col("bv").as("bv2"), col("id").as("idb"), col("sig").as("sb"))
    l.join(r, col("band") === col("band2") && col("bv") === col("bv2") && col("ida") < col("idb"))
      .select(col("ida"), col("idb"), hammingUdf(col("sa"), col("sb")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash-blocked near-dup pairs with EXACT n-gram Jaccard verification:
    * same banded candidate generation as [[simhashPairs]], but candidates
    * are verified against the true k-shingle Jaccard (>= threshold) rather
    * than the Hamming proxy — the production shape when downstream needs a
    * guaranteed-exact similarity, and oracle-checkable because the output
    * is a subset of the exact pair relation. */
  def simhashVerifiedPairs(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 3, threshold: Double = 0.8,
                           maxHamming: Int = 3): DataFrame = {
    val txt = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val jacc = udf((a: String, b: String) => {
      val sa = TextFns.shingles(a, k).toSet
      val sb = TextFns.shingles(b, k).toSet
      if (sa.isEmpty && sb.isEmpty) 1.0
      else (sa intersect sb).size.toDouble / (sa union sb).size
    })
    simhashPairs(df, idCol, textCol, maxHamming).select("ida", "idb")
      .join(txt.select(col("id").as("ida"), col("text").as("ta")), Seq("ida"))
      .join(txt.select(col("id").as("idb"), col("text").as("tb")), Seq("idb"))
      .withColumn("jaccard", round(jacc(col("ta"), col("tb")), 4))
      .filter(col("jaccard") >= threshold)
      .select("ida", "idb", "jaccard")
  }

  /** Near-dup **clustering with survivor selection** — what a training
    * pipeline actually executes after pair generation: near-dup pairs form
    * a similarity graph whose connected components are dedup groups; one
    * canonical survivor (min id) is kept per group. Pairs come from any of
    * the pair generators above. The graph is corpus-global (no doc key
    * bounds a component), so this exercises the ITERATIVE DataFrame
    * union-find — min-label propagation rounds are bounded by component
    * diameter, which near-dup transitivity keeps shallow.
    * Output: (id, group, keep). Singleton docs keep themselves. */
  def dedupClusters(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    import graft.link.ConnectedComponents
    // materialize the pair stage ONCE (it is typically the output of an
    // expensive LSH pipeline) so CC iterations never recompute it
    val p = pairs.select(col("ida").cast("string").as("a"),
      col("idb").cast("string").as("b")).localCheckpoint(true)
    // iterate only over vertices that occur in a pair — the near-dup graph
    // is a vanishing fraction of the corpus, so the label-propagation
    // rounds never shuffle the full id set
    val touched = p.select(col("a").as("v")).union(p.select(col("b").as("v"))).distinct()
    val comp = ConnectedComponents.run(
      touched.select(lit("g").as("key"), col("v")),
      p.select(lit("g").as("key"), col("a"), col("b")))
    // component label = lexicographic min member (min-label fixpoint), so
    // keep == (id == group) — no window shuffle; singletons keep themselves
    df.select(col(idCol).cast("string").as("id"))
      .join(comp.select(col("v").as("id"), col("component")), Seq("id"), "left")
      .withColumn("group", coalesce(col("component"), col("id")))
      .select(col("id"), col("group"), (col("id") === col("group")).as("keep"))
  }

  /** Embedding-cosine near-dup pairs via multi-table random-hyperplane LSH
    * (deterministic planes from a fixed seed): each vector lands in one
    * cell per table; one side additionally probes Hamming-1 cells; exact
    * cosine verification restricted to co-bucketed candidates. Recall for
    * cosine >= threshold compounds across tables. */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                           threshold: Double = 0.95, tables: Int = 4,
                           bits: Int = 8, dim: Int = 64, seed: Long = 7L): DataFrame = {
    val codes = Similarity.codesUdf(tables, bits, dim, seed)
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val coded = vecs.withColumn("codes", codes(col("v")))
    // candidate generation and dedup carry ONLY (cell, id): the distinct
    // shuffle moves id pairs, not 2x full float vectors (the payloads are
    // rejoined once, per side, for exact verification)
    val l = coded.select(col("id").as("ida"),
      explode(Similarity.cellsUdf(tables)(col("codes"))).as("cell"))
    val r = coded.select(col("id").as("idb"),
      explode(Similarity.probesUdf(tables, bits)(col("codes"))).as("cell"))
    val cos = udf((a: Seq[Float], b: Seq[Float]) => TextFns.cosine(a.toArray, b.toArray))
    l.join(r, l("cell") === r("cell") && col("ida") < col("idb"))
      .select("ida", "idb").distinct()
      .join(vecs.select(col("id").as("ida"), col("v").as("va")), Seq("ida"))
      .join(vecs.select(col("id").as("idb"), col("v").as("vb")), Seq("idb"))
      .withColumn("cosine", round(cos(col("va"), col("vb")), 4))
      .filter(col("cosine") >= threshold)
      .select("ida", "idb", "cosine")
  }
}
