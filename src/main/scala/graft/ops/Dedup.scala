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

  /** Default shingle document-frequency cap for n-gram Jaccard candidate
    * generation. Candidate volume through one shingle is df·(df−1)/2, so
    * the default bounds any single shingle's contribution to ~500k pairs
    * and shuts off the sum(df²) blowup on stop-shingles that an uncapped
    * external call would otherwise execute at corpus scale. 0 = uncapped,
    * explicit opt-in only. */
  val DefaultMaxShingleDf: Long = 1000L

  /** Exact dedup: hash-groupBy, canonical survivor = min id.
    * Returns (id, content_hash, group_size, keep).
    *
    * groupBy-aggregate + rejoin rather than windows over `content_hash`: at
    * 100 TB a handful of hashes (boilerplate/empty documents) are
    * astronomically hot, and a window partition ships every duplicate row
    * to ONE task; the aggregate is partial-aggregation-friendly (map-side
    * combine collapses each hot hash to one row per map task) and the
    * rejoin shuffles the tiny (hash, size, min) relation. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(col(idCol).as("id"), md5(col(textCol)).as("content_hash"))
    val groups = hashed.groupBy(col("content_hash"))
      .agg(count(lit(1)).as("group_size"), min(col("id")).as("min_id"))
    hashed.join(groups, Seq("content_hash"))
      .select(col("id"), col("content_hash"), col("group_size"),
        (col("id") === col("min_id")).as("keep"))
  }

  private val shinglesUdf = udf((t: String, k: Int) => TextFns.shingleHashes(t, k))
  private val minhashUdf = udf((t: String, k: Int, p: Int) => TextFns.minhash(t, k, p))
  private val simhashUdf = udf((t: String) => TextFns.simhash64(t))

  /** Per-doc distinct k-shingle sets as 64-BIT FNV-1a HASHES, computed
    * ONCE per corpus: every verification path joins against this instead
    * of re-shingling both documents per candidate pair (O(pairs x doc
    * length) repeated work). Hashing is a byte diet (guide §2.3, narrower
    * types): the exploded (id, shingle) stream feeds THREE corpus-wide
    * shuffles on the capped path (hot counts, dup groups, per-doc
    * features) and every verify join — 8-byte longs where ~25-byte
    * shingle strings used to ride. Set sizes, intersections and unions
    * are preserved unless two DISTINCT shingles collide in 64 bits: the
    * expected number of colliding pairs among n corpus-wide distinct
    * shingles is ~n²/2^65, and one collision perturbs ONE pair's
    * intersection by one unit. A collision is deterministic (same hash
    * every run) and would surface as an oracle hash mismatch at verify
    * time — the same trade the dup-span SpanHashes path (Lee et al.
    * windows as 8-byte longs) and the linker's xxhash64 name ids
    * already accepted in earlier rounds. */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol).as("id"), shinglesUdf(col(textCol), lit(k)).as("sh"))

  /** Exact-Jaccard verification of candidate (ida, idb) pairs against the
    * pre-computed full shingle sets — `array_intersect`/`size` built-ins,
    * whole-stage-codegen, no per-pair re-shingling.
    *
    * The threshold filter runs on the UNROUNDED value (rounding first would
    * admit pairs whose true Jaccard sits in [threshold − 5e-5, threshold),
    * which the DuckDB oracles — filtering unrounded — exclude); rounding to
    * 4 decimals happens only on the reported column. Two EMPTY shingle sets
    * are identical (empty) documents: Jaccard 1, matching the oracle, whose
    * empty docs carry a single ''-shingle — not a 0/0 null that would
    * silently drop the pair. */
  /** NOTE: constructing the returned DataFrame is EAGER (the candidate
    * stage materializes at stageCut time) — by design, since both caches
    * below have two consumers each; plan-only callers (explain dumps)
    * should prefer the capped ngramJaccard path or accept the compute.
    * The cleanup thunk frees both caches; lineage is kept, so a
    * post-cleanup consumer recomputes instead of failing. */
  private def verifyJaccardHandle(cands0: DataFrame, sets: DataFrame,
                                  threshold: Double): (DataFrame, () => Unit) = {
    // materialize the (slim) candidate pairs once: they feed the touched-id
    // projection and the verify join — recomputing them would re-run the
    // whole candidate-generation subtree per consumer
    val (cands, candsRdd) = graft.core.Materialize.stageCutHandle(
      cands0.select("ida", "idb"))
    val touched = cands.select(col("ida").as("id"))
      .union(cands.select(col("idb").as("id"))).distinct()
    // verification working set: shingle sets for candidate-TOUCHED docs
    // only — one corpus pass (semi join; AQE broadcasts the tiny touched
    // side), cached so the ida- and idb-side joins below don't each
    // re-shingle the full corpus. Bounded by the candidate volume, the
    // same working set any exact verification must hold.
    val (tsets, tsetsRdd) = graft.core.Materialize.stageCutHandle(
      sets.join(touched, Seq("id"), "left_semi"))
    // LOSSLESS size prefilter before the heavy array join: inter <=
    // min(na, nb) and union >= max(na, nb), so J >= t forces
    // min(na, nb) >= t * max(na, nb). Candidate pairs are generated from
    // one shared blocking key and routinely outnumber true pairs 1000:1;
    // pruning on two cached longs keeps the full shingle ARRAYS (the
    // dominant shuffle payload — KBs per row vs 16 bytes) off every pair
    // the size ratio alone refutes. Both-empty pairs pass (0 >= t*0) and
    // land on the J=1.0 branch, matching the oracle's empty-doc semantics.
    val sizes = tsets.select(col("id"), size(col("sh")).as("n"))
    val pruned = cands
      .join(sizes.select(col("id").as("ida"), col("n").as("na")), Seq("ida"))
      .join(sizes.select(col("id").as("idb"), col("n").as("nb")), Seq("idb"))
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(threshold) * greatest(col("na"), col("nb")).cast("double"))
      .select("ida", "idb")
    val inter = size(array_intersect(col("sha"), col("shb")))
    val exact = when(size(col("sha")) === 0 && size(col("shb")) === 0, lit(1.0))
      .otherwise(inter.cast("double") /
        (size(col("sha")) + size(col("shb")) - inter))
    val out = pruned
      .join(tsets.select(col("id").as("ida"), col("sh").as("sha")), Seq("ida"))
      .join(tsets.select(col("id").as("idb"), col("sh").as("shb")), Seq("idb"))
      .withColumn("j", exact)
      .filter(col("j") >= threshold)
      .select(col("ida"), col("idb"), round(col("j"), 4).as("jaccard"))
    (out, () => {
      candsRdd.unpersist(blocking = false)
      tsetsRdd.unpersist(blocking = false)
    })
  }

  /** Exact n-gram (word k-shingle) Jaccard near-dup pairs >= threshold.
    *
    * Blocked self-join on shingles: candidate pair volume is
    * sum(df(shingle)^2); shingles more frequent than `maxShingleDf` docs are
    * excluded from *candidate generation* (a pair that only shares
    * ultra-common shingles cannot reach a high Jaccard). The cap prunes
    * CANDIDATES only — every surviving pair is re-verified against the FULL
    * shingle sets, so the reported Jaccard (numerator included) is exact
    * regardless of the cap.
    *
    * The cap DEFAULTS ON (1000): an uncapped call at corpus scale selects
    * the blocked self-join whose candidate volume is sum(df^2) over
    * stop-shingles — the scale-killing plan. A pair can only be *missed*
    * by the cap if every shingle it shares appears in >1000 documents,
    * i.e. the two docs overlap only through boilerplate; at the default
    * 0.8 threshold such a pair is not a near-duplicate. Pass
    * maxShingleDf=0 to EXPLICITLY opt into the uncapped all-shingles
    * plan (small data / oracle-parity mode only). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.8,
                        maxShingleDf: Long = DefaultMaxShingleDf): DataFrame =
    // fire-and-forget callers discard the cleanup thunk, so this wrapper
    // must not pin a corpus-TOKEN-sized cache for the session lifetime:
    // it trades the exploded-stream cache for re-shingling (3 scans) and
    // pins only the bounded working sets (dup groups <= cap members each,
    // per-doc features O(#docs)). Latency-sensitive callers that can free
    // eagerly use [[ngramJaccardPairsHandle]], which keeps the
    // single-shingle-pass cache.
    ngramJaccardImpl(df, idCol, textCol, k, threshold, maxShingleDf,
      cacheExploded = false)._1

  /** [[ngramJaccardPairs]] plus a cleanup thunk for long-lived sessions:
    * frees the working-set caches (candidate pairs + touched shingle sets
    * on the uncapped path; the exploded stream + hot-shingle table on the
    * capped path) once
    * the caller has consumed the result. Without it each invocation pins
    * its working set for the session's lifetime; lineage is kept, so a
    * post-cleanup consumer recomputes instead of failing. */
  def ngramJaccardPairsHandle(df: DataFrame, idCol: String, textCol: String,
                              k: Int = 3, threshold: Double = 0.8,
                              maxShingleDf: Long = DefaultMaxShingleDf): (DataFrame, () => Unit) =
    ngramJaccardImpl(df, idCol, textCol, k, threshold, maxShingleDf,
      cacheExploded = true)

  /** `cacheExploded = true`: cache the exploded (id, shingle) stream so
    * the corpus is shingled exactly once (fastest; corpus-token-sized
    * cache until the handle's cleanup runs). `false`: never materialize
    * anything corpus-token-sized — the shingle scan runs once per
    * consumer (3×), and only the bounded dup-group / per-doc-feature
    * tables are cached (the right trade for callers that cannot free). */
  private def ngramJaccardImpl(df: DataFrame, idCol: String, textCol: String,
                               k: Int, threshold: Double, maxShingleDf: Long,
                               cacheExploded: Boolean): (DataFrame, () => Unit) = {
    val sets = shingleSets(df, idCol, textCol, k)
    val lazyEx = sets.select(col("id"), explode(col("sh")).as("g"))
    if (maxShingleDf > 0) {
      // the capped path reads the exploded (id, g) stream THREE times (hot
      // shingle counts, dup-shingle groups, per-doc features)
      val (ex, exFree): (DataFrame, () => Unit) =
        if (cacheExploded) {
          val (d, r) = graft.core.Materialize.stageCutHandle(lazyEx)
          (d, () => r.unpersist(blocking = false))
        } else (lazyEx, () => ())
      // Capped path: candidate generation AND exact verification without
      // ever shuffling a full shingle array. Shared shingles split by the
      // global hotness of the shingle (df > cap), and the two halves of
      // the exact intersection come from different, individually cheap
      // plans:
      //   inter(a,b) = |shared non-hot|  (a COUNT on the in-group pair
      //                join — each shared non-hot shingle contributes
      //                exactly one row, since per-doc shingle sets are
      //                distinct)
      //             + |hotset(a) ∩ hotset(b)|  (per-DOC hot-shingle sets
      //                are bounded by the doc's own shingle count and are
      //                tiny in practice — only boilerplate shingles land
      //                in them)
      // so J = inter / (na + nb − inter) is exact — same integers the
      // full-set formulation and the DuckDB oracle produce — while the
      // heaviest thing any pair-keyed shuffle carries is a count.
      //
      // The hot-shingle anti-join MUST precede collect_set: filtering on
      // size(ids) after collecting would still accumulate a boilerplate
      // shingle's entire posting list (millions of ids at corpus scale)
      // in one aggregation buffer before discarding it.
      // with the exploded stream uncached, stage-cut the (tiny, O(#hot
      // shingles)) hot table itself: it feeds BOTH the grouped and the
      // docFeats stage-cuts, and leaving it lazy makes each of them
      // recompute the aggregation — a fourth full-corpus shingle scan
      // ALWAYS stage-cut the (tiny, O(#hot shingles)) hot table: its two
      // consumers sit in DIFFERENT jobs (the `grouped` stage cut's
      // anti-join broadcast and the final job's left-join broadcast), so
      // without a cut the full-corpus hot aggregation runs once per
      // broadcast — exchange reuse never applies across jobs. One tiny
      // barrier buys back a full exploded-stream aggregation.
      val hot0 = ex.groupBy("g").agg(count(lit(1)).as("df_g"))
        .filter(col("df_g") > maxShingleDf).select("g")
      val (hot, hotFree): (DataFrame, () => Unit) = {
        val (d, r) = graft.core.Materialize.stageCutHandle(hot0)
        (d, () => r.unpersist(blocking = false))
      }
      // dup-shingle working set (groups of 2..cap docs): LAZY — its two
      // consumers (the l/r posexplode sides of the pair join) sit in the
      // SAME job, so AQE stage reuse dedups the aggregation exchange under
      // it; only the cheap final collect_set merge runs once per side,
      // bounded by the cap. The r5 stage cut here paid a barrier plus a
      // cache copy of every ids array to save that duplicate final merge —
      // measured at sf0.1 (QTime min of 5): cut 4.45 s, lazy 2.05 s, rows
      // identical, shuffle 38→32 MiB, jobs 16→13. (Contrast `hot` below,
      // whose consumers are in DIFFERENT jobs — exchange reuse never
      // applies across jobs, so its cut stays.) Pairs expand through a
      // posexplode self-join on (group, i < j) — pure codegen, and
      // position comparison works for any id type
      val grouped =
        ex.join(broadcast(hot), Seq("g"), "left_anti")
          .groupBy("g")
          .agg(sort_array(collect_set(col("id"))).as("ids"))
          .filter(size(col("ids")) >= 2)
      val l = grouped.select(col("g"), posexplode(col("ids"))).toDF("g", "i", "ida")
      val r = grouped.select(col("g").as("g2"), posexplode(col("ids"))).toDF("g2", "j", "idb")
      val pairRare = l.join(r, col("g") === col("g2") && col("i") < col("j"))
        .groupBy("ida", "idb").agg(count(lit(1)).as("ir"))
      // one corpus pass for both per-doc features: full set size and the
      // doc's (small) hot-shingle set — collect_set skips the nulls the
      // left join leaves on non-hot shingles, so hsh is [] when none.
      // Consumed twice (ida / idb join sides): with the exploded stream
      // uncached, stage-cut this O(#docs) table instead so the second
      // consumer doesn't trigger a fourth shingle scan.
      val docFeats0 = ex
        .join(broadcast(hot.withColumn("is_hot", lit(true))), Seq("g"), "left")
        .groupBy("id")
        .agg(count(lit(1)).as("n"),
          collect_set(when(col("is_hot"), col("g"))).as("hsh"))
      val (docFeats, docFeatsFree): (DataFrame, () => Unit) =
        if (cacheExploded) (docFeats0, () => ())
        else {
          val (d, r) = graft.core.Materialize.stageCutHandle(docFeats0)
          (d, () => r.unpersist(blocking = false))
        }
      // lossless size prune before the hot-set join: inter <= min(na, nb)
      // and union >= max(na, nb), so J >= t forces min >= t * max
      val withFeats = pairRare
        .join(docFeats.select(col("id").as("ida"), col("n").as("na"),
          col("hsh").as("hsha")), Seq("ida"))
        .join(docFeats.select(col("id").as("idb"), col("n").as("nb"),
          col("hsh").as("hshb")), Seq("idb"))
        .filter(least(col("na"), col("nb")).cast("double") >=
          lit(threshold) * greatest(col("na"), col("nb")).cast("double"))
      val inter = (col("ir") +
        size(array_intersect(col("hsha"), col("hshb")))).cast("double")
      val out = withFeats
        .withColumn("j", inter / (col("na") + col("nb") - inter))
        .filter(col("j") >= threshold)
        .select(col("ida"), col("idb"), round(col("j"), 4).as("jaccard"))
      (out, () => {
        docFeatsFree()
        hotFree()
        exFree()
      })
    } else {
      // uncapped (oracle-parity mode): group sizes are unbounded, so a
      // collect_set could blow a single task's memory — keep the blocked
      // self-join, whose shuffles stream, and verify against full sets
      val a = lazyEx.select(col("g"), col("id").as("ida"))
      val b = lazyEx.select(col("g").as("g2"), col("id").as("idb"))
      val cands = a.join(b, col("g") === col("g2") && col("ida") < col("idb"))
        .select("ida", "idb").distinct()
      verifyJaccardHandle(cands, sets, threshold)
    }
  }

  /** MinHash + LSH near-dup candidates, verified with exact Jaccard.
    * signature → `bands` bands of numPerm/bands rows each → band-hash
    * equi-join → exact verification restricted to candidates. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, numPerm: Int = 16, bands: Int = 4,
                      threshold: Double = 0.8): DataFrame =
    minhashLshPairsHandle(df, idCol, textCol, k, numPerm, bands, threshold)._1

  /** [[minhashLshPairs]] plus a cleanup thunk freeing the verification
    * working-set caches (same contract as [[ngramJaccardPairsHandle]]). */
  def minhashLshPairsHandle(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 3, numPerm: Int = 16, bands: Int = 4,
                            threshold: Double = 0.8): (DataFrame, () => Unit) = {
    val rows = numPerm / bands
    val sig = df.select(col(idCol).as("id"),
      minhashUdf(col(textCol), lit(k), lit(numPerm)).as("sig"))
    // band value = hash of its slice of the signature; candidates carry only
    // (band, bh, id) — shingle sets rejoin after the pair-distinct, so the
    // heavy payload never rides the candidate shuffle
    val withBands = sig.select(col("id"),
      explode(expr(s"transform(sequence(0, ${bands - 1}), b -> struct(b as band, hash(slice(sig, b*$rows+1, $rows)) as bh))")).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bh"))
    val l = withBands.select(col("band"), col("bh"), col("id").as("ida"))
    val r = withBands.select(col("band").as("band2"), col("bh").as("bh2"), col("id").as("idb"))
    val cands = l.join(r, col("band") === col("band2") && col("bh") === col("bh2") && col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    verifyJaccardHandle(cands, shingleSets(df, idCol, textCol, k), threshold)
  }

  /** SimHash near-dup pairs: 64-bit simhash split into `64/bandBits` bands
    * (pigeonhole: any pair within Hamming distance `bands-1` must agree on
    * >= 1 band, so blocking recall for the Hamming criterion is structurally
    * 1.0 whenever maxHamming <= 64/bandBits - 1), verified by exact Hamming
    * distance. Default 4 x 16-bit bands covers the classic maxHamming=3;
    * bandBits=8 gives 8 bands covering maxHamming<=7 at the cost of more
    * candidates (the 100 TB trade-off knob). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, bandBits: Int = 16): DataFrame =
    simhashPairsFromSigs(
      df.select(col(idCol).as("id"), simhashUdf(col(textCol)).as("sig")),
      maxHamming, bandBits)

  /** [[simhashPairs]] over an ALREADY-COMPUTED (id, sig) table — lets a
    * caller that needs the signatures for its own purposes (the
    * candidate-volume valve) compute them exactly once. */
  private[graft] def simhashPairsFromSigs(sigs: DataFrame,
                                          maxHamming: Int, bandBits: Int): DataFrame = {
    require(64 % bandBits == 0, s"bandBits must divide 64, got $bandBits")
    val bands = 64 / bandBits
    require(maxHamming <= bands - 1,
      s"maxHamming=$maxHamming needs >= ${maxHamming + 1} bands (pigeonhole); got $bands")
    val mask = (1L << bandBits) - 1
    val banded = sigs.select(col("id"), col("sig"),
      explode(expr(s"transform(sequence(0, ${bands - 1}), b -> struct(b as band, shiftright(sig, b*$bandBits) & ${mask}L as bv))")).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bv"))
    val l = banded.select(col("band"), col("bv"), col("id").as("ida"), col("sig").as("sa"))
    val r = banded.select(col("band").as("band2"), col("bv").as("bv2"), col("id").as("idb"), col("sig").as("sb"))
    // Hamming filter BEFORE the pair-distinct: the xor/bit_count is a
    // per-joined-row codegen expression, while distinct is a shuffle — at
    // wide nets (4-bit bands => n/16 docs per bucket) the co-bucketed
    // candidate volume dwarfs the surviving pairs, so filtering first cuts
    // the distinct's input by orders of magnitude. Identical output set
    // (hamming is a function of the pair, so filter and distinct commute).
    l.join(r, col("band") === col("band2") && col("bv") === col("bv2") && col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** SimHash-blocked near-dup pairs with EXACT n-gram Jaccard verification:
    * same banded candidate generation as [[simhashPairs]], but candidates
    * are verified against the true k-shingle Jaccard (>= threshold) rather
    * than the Hamming proxy — the production shape when downstream needs a
    * guaranteed-exact similarity, and oracle-checkable because the output
    * is a subset of the exact pair relation. The wide default Hamming net
    * (maxHamming=15 over 16x4-bit bands) exists because simhash Hamming is
    * a PROXY for Jaccard: at J=0.8 the expected differing-bit count is
    * already ~64*(1-J)/(1+J) ~ 7 with a long tail (measured max 13 over
    * the audited corpora's true pair sets — OracleCheck prints the
    * distribution), so a tight net drops real pairs. The trade-off is
    * candidate volume (4-bit bands bucket n/16 docs each): the RIGHT tool
    * at 100 TB for J~0.8 is minhash LSH; simhash with narrow bands
    * ([[simhashPairs]]'s 16-bit default) is the near-duplicate detector
    * for ham<=3 / J>=0.95 territory. This verified variant is audited
    * recall 1.0 vs the exact pair set (OracleCheck + the OpsSpec
    * exact-set test). */
  def simhashVerifiedPairs(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 3, threshold: Double = 0.8,
                           maxHamming: Int = 15, bandBits: Int = 4): DataFrame =
    simhashVerifiedPairsHandle(df, idCol, textCol, k, threshold, maxHamming, bandBits)._1

  /** Valve-trip counter — spec observability only (OpsSpec asserts the
    * valve fires on a hot-bucket corpus and stays silent on normal data). */
  @volatile private[graft] var simhashValveTrips: Long = 0L

  /** [[simhashVerifiedPairs]] plus a cleanup thunk freeing the verification
    * working-set caches (same contract as [[ngramJaccardPairsHandle]]).
    *
    * '''Candidate-volume valve''': the wide net (4-bit bands) buckets
    * ~n/16 docs per band value on a homogeneous corpus, so co-bucketed
    * candidate volume approaches O(n²/16) — a scale-killer if this bridge
    * path were ever pointed at a big corpus. Before generating pairs the
    * valve measures Σ c·(c−1)/2 over the band buckets (one cheap
    * map-side-combined aggregation of the signatures); past
    * `maxCandidates` it LOUDLY auto-switches candidate generation to
    * minhash LSH (linear banding; same exact-Jaccard verification, recall
    * audited by DedupSpec/OracleCheck) instead of materializing a
    * quadratic join. The default bound caps the candidate join at a size
    * one stage handles comfortably; verify-scale corpora never trip it,
    * so the oracle bridge keeps its exact wide-net semantics there. */
  def simhashVerifiedPairsHandle(df: DataFrame, idCol: String, textCol: String,
                                 k: Int = 3, threshold: Double = 0.8,
                                 maxHamming: Int = 15, bandBits: Int = 4,
                                 maxCandidates: Long = 100000000L)
      : (DataFrame, () => Unit) = {
    // validate UNCONDITIONALLY, before the probe: otherwise a bad banding
    // config on a hot corpus silently succeeds through the minhash
    // fallback while the same call on a sparse corpus throws — parameter
    // validation must not be data-dependent
    require(64 % bandBits == 0, s"bandBits must divide 64, got $bandBits")
    val bands = 64 / bandBits
    require(maxHamming <= bands - 1,
      s"maxHamming=$maxHamming needs >= ${maxHamming + 1} bands (pigeonhole); got $bands")
    val mask = (1L << bandBits) - 1
    // signatures computed ONCE and stage-cut: the valve probe and the
    // non-tripped pair generation both read them (recomputing the
    // tokenize+FNV fold per consumer would double the corpus scan cost)
    val (sigs, sigsRdd) = graft.core.Materialize.stageCutHandle(
      df.select(col(idCol).as("id"), simhashUdf(col(textCol)).as("sig")))
    // double, not long: the probe is a heuristic and Σc² on a pathological
    // corpus can exceed Long — overflow must not wrap into "small"
    val vol = sigs
      .select(explode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"b -> struct(b as band, shiftright(sig, b*$bandBits) & ${mask}L as bv))")).as("bb"))
      .groupBy(col("bb.band"), col("bb.bv")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c").cast("double") * (col("c") - 1).cast("double") / 2))
      .head().getAs[Any](0) match {
        case null => 0.0
        case d: java.lang.Double => d.doubleValue()
        case other => other.toString.toDouble
      }
    if (vol > maxCandidates.toDouble) {
      simhashValveTrips += 1
      System.err.println(f"[graft] WARNING: simhash wide-net candidate volume ~$vol%.3g " +
        s"exceeds maxCandidates=$maxCandidates -- auto-switching candidate generation " +
        "to minhash LSH (same exact-Jaccard verification; banding recall audited by " +
        "DedupSpec/OracleCheck). The wide net is an oracle bridge for verify-scale " +
        "corpora, not a production detector -- see simhashPairs for the linear path.")
      sigsRdd.unpersist(blocking = false)
      minhashLshPairsHandle(df, idCol, textCol, k, threshold = threshold)
    } else {
      val (res, free) = verifyJaccardHandle(
        simhashPairsFromSigs(sigs, maxHamming, bandBits).select("ida", "idb"),
        shingleSets(df, idCol, textCol, k), threshold)
      (res, () => { free(); sigsRdd.unpersist(blocking = false) })
    }
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
  def dedupClusters(df: DataFrame, idCol: String, pairs: DataFrame,
                    bigStar: Boolean = false): DataFrame =
    dedupClustersHandle(df, idCol, pairs, bigStar)._1

  /** [[dedupClusters]] plus a cleanup thunk for long-lived sessions: the
    * expensive pair-table cache is ALWAYS freed eagerly here (once CC has
    * converged the label cache carries everything the output plan reads;
    * kept lineage means a post-unpersist block loss recomputes instead of
    * failing), and the thunk frees the remaining small label cache once
    * the caller has consumed/persisted the result — without it, repeated
    * invocations in one session would pin one label table each. */
  /** `bigStar = true` routes component formation through the large-star/
    * small-star contraction ([[graft.link.ConnectedComponents.runBigStar]])
    * instead of min-label propagation — same labels (min member), round
    * count O(log² n) instead of component diameter, for pair graphs whose
    * transitive chains are not bounded by construction. */
  def dedupClustersHandle(df: DataFrame, idCol: String, pairs: DataFrame,
                          bigStar: Boolean = false): (DataFrame, () => Unit) = {
    import graft.link.ConnectedComponents
    // materialize the pair stage ONCE (it is typically the output of an
    // expensive LSH pipeline) so CC iterations never recompute it
    val (p, pRdd) = graft.core.Materialize.stageCutHandle(
      pairs.select(col("ida").cast("string").as("a"),
        col("idb").cast("string").as("b")))
    // iterate only over vertices that occur in a pair — the near-dup graph
    // is a vanishing fraction of the corpus, so the label-propagation
    // rounds never shuffle the full id set
    val touched = p.select(col("a").as("v")).union(p.select(col("b").as("v"))).distinct()
    val cc = if (bigStar) ConnectedComponents.runBigStarHandle(_, _, 40)
             else ConnectedComponents.runHandle(_, _, 25)
    val (comp, compRdd) = cc(
      touched.select(lit("g").as("key"), col("v")),
      p.select(lit("g").as("key"), col("a"), col("b")))
    pRdd.unpersist(blocking = false)
    // component label = lexicographic min member (min-label fixpoint), so
    // keep == (id == group) — no window shuffle; singletons keep themselves
    val out = df.select(col(idCol).cast("string").as("id"))
      .join(comp.select(col("v").as("id"), col("component")), Seq("id"), "left")
      .withColumn("group", coalesce(col("component"), col("id")))
      .select(col("id"), col("group"), (col("id") === col("group")).as("keep"))
    (out, () => compRdd.unpersist(blocking = false))
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
    l.join(r, l("cell") === r("cell") && col("ida") < col("idb"))
      .select("ida", "idb").distinct()
      .join(vecs.select(col("id").as("ida"), col("v").as("va")), Seq("ida"))
      .join(vecs.select(col("id").as("idb"), col("v").as("vb")), Seq("idb"))
      // threshold on the UNROUNDED cosine (the oracle filters unrounded);
      // rounding only the reported column. Native codegen CosineSim, not
      // a boxed Seq[Float] UDF — same expression the ANN scorers use.
      .withColumn("c", Similarity.cosCol(col("va"), col("vb")))
      .filter(col("c") >= threshold)
      .select(col("ida"), col("idb"), round(col("c"), 4).as("cosine"))
  }

  /** Cross-document duplicated-span statistics — the span-level exact-dedup
    * signal of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    * Models Better", arXiv:2107.06499): slide a k-token window over every
    * document (the dedup family's `[^a-zA-Z0-9]+` lowercase tokenization)
    * and mark a window occurrence duplicated iff its hash occurs at least
    * twice in the WHOLE corpus (within- or cross-document — a full
    * suffix-array finds arbitrary-length repeats; fixed-k windows are the
    * bounded-memory streaming approximation). Documents with fewer than k
    * tokens emit no row (they have no window).
    *
    * 100 TB shape: the text is scanned ONCE — all window hashes come out
    * of one native-expression pass ([[graft.functions.SpanHashes]]), so
    * everything after the scan ships 8-byte longs, never
    * span text. Three partial-agg-friendly hash shuffles: per-(id, window)
    * multiplicities, per-window corpus totals (slim (h, m) rows), and the
    * per-doc rollup of the joined result. A boilerplate span hot in
    * millions of documents skews only the (h)-keyed join, which AQE's
    * skew-join splitting handles — no window-function-over-hot-key stage
    * anywhere. Returns (id, n_windows, n_dup_windows, dup_span_frac). */
  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 20): DataFrame = {
    require(k >= 1, s"window size must be >= 1, got $k")
    // window hashing is a native expression (functions/SpanHashesExpr):
    // one compiled pass per document. The first cut built windows with
    // nested HOFs (transform(sequence) x aggregate(slice)) — those run
    // INTERPRETED per element with boxing, and profiling at sf0.1 showed
    // the whole 23 s query wall was that expression, not the shuffles
    val per = df.select(col(idCol).as("id"), col(textCol).as("_t"))
      .select(col("id"),
        explode(graft.functions.SpanHashes(coalesce(col("_t"), lit("")), k)).as("h"))
      .groupBy("id", "h").agg(count(lit(1)).as("m"))
    val cnt = per.groupBy("h").agg(sum("m").as("c"))
    per.join(cnt, Seq("h"))
      .groupBy("id").agg(
        sum("m").as("n_windows"),
        sum(when(col("c") >= 2, col("m")).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_span_frac",
        round(col("n_dup_windows") / col("n_windows"), 4))
  }

  /** Per-doc rebuild for [[dupSpanRemoval]]: re-tokenize (the dedup
    * family's contract, same compiled code the window hashes came from),
    * mark every token covered by a removed window start, emit the kept
    * tokens re-joined with single spaces. A UDF is fine here — it runs
    * ONCE per document on already-aggregated slim inputs, not per window
    * in a hot loop, and it returns a struct (n_tokens, n_removed, text),
    * which built-ins can't assemble without re-tokenizing three times. */
  private val dropSpansUdf = udf((text: String, k: Int, starts: Seq[Int]) => {
    val ws = graft.functions.SpanHash.tokens(if (text == null) "" else text)
    val covered = new Array[Boolean](ws.length)
    if (starts != null) starts.foreach { s =>
      var i = s
      val end = math.min(s + k, ws.length)
      while (i < end) { covered(i) = true; i += 1 }
    }
    val kept = new java.lang.StringBuilder
    var removed = 0L
    var i = 0
    while (i < ws.length) {
      if (covered(i)) removed += 1
      else {
        if (kept.length > 0) kept.append(' ')
        kept.append(ws(i))
      }
      i += 1
    }
    (ws.length.toLong, removed, kept.toString)
  })

  /** Cross-document duplicated-span REMOVAL — the dedup step of Lee et al.
    * 2022 (arXiv:2107.06499) that [[dupSpanStats]] only measures: every
    * k-token window whose hash occurs at least twice corpus-wide keeps
    * exactly ONE occurrence (the globally first by (id, pos)); tokens
    * covered by every other occurrence are dropped and the document is
    * re-emitted without them. Fixed-k windows are the bounded-memory
    * approximation of the paper's suffix-array arbitrary-length repeats;
    * overlapping removed windows merge naturally through the coverage
    * bitmap. Output: one row per input document —
    * (id, n_tokens, n_removed, text_deduped), where `text_deduped` is the
    * kept tokens of the NORMALIZED stream (lowercased alnum words)
    * rejoined with spaces.
    *
    * 100 TB shape: one native-expression scan produces all window hashes
    * ([[graft.functions.SpanHashes]]); everything after ships 8-byte
    * longs + int positions, never span text. The survivor is
    * `min(struct(id, pos))` under a groupBy — partial-aggregation
    * collapses each hot boilerplate hash to one row per map task (no
    * window-function-over-hot-key stage); the only skewable stage is the
    * (h)-keyed rejoin, which AQE skew-split handles, and its output is
    * immediately re-keyed by doc id (bounded per-doc fan-in). The rebuild
    * runs once per document over its own text. */
  def dupSpanRemoval(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 20): DataFrame = {
    require(k >= 1, s"window size must be >= 1, got $k")
    val base = df.select(col(idCol).as("id"),
      coalesce(col(textCol), lit("")).as("_t"))
    val pos = base
      .select(col("id"), posexplode(graft.functions.SpanHashes(col("_t"), k)))
      .toDF("id", "pos", "h")
    // two-level survivor aggregation: min over a struct key can't use a
    // hash aggregate (Spark falls back to sort-based), so the corpus-sized
    // window stream is first collapsed by a HASH aggregate on (h, id) —
    // whose composite key also spreads a hot boilerplate hash across the
    // shuffle by doc — and the struct-min runs only on the collapsed
    // one-row-per-(window, doc) stream. min(struct(id, first-pos-in-doc))
    // is exactly the global min (id, pos): the minimal doc's minimal pos.
    val perDoc = pos.groupBy("h", "id")
      .agg(min("pos").as("fpos"), count(lit(1)).as("m"))
    val surv = perDoc.groupBy("h")
      .agg(sum("m").as("c"),
        min(struct(col("id"), col("fpos").as("pos"))).as("surv"))
      .filter(col("c") >= 2)
      .select(col("h"), col("surv"))
    val removedStarts = pos.join(surv, Seq("h"))
      .filter(!(col("id") === col("surv").getField("id") &&
        col("pos") === col("surv").getField("pos")))
      .groupBy("id").agg(collect_list(col("pos")).as("starts"))
    base.join(removedStarts, Seq("id"), "left")
      .withColumn("r", dropSpansUdf(col("_t"), lit(k), col("starts")))
      .select(col("id"), col("r").getField("_1").as("n_tokens"),
        col("r").getField("_2").as("n_removed"),
        col("r").getField("_3").as("text_deduped"))
  }

  /** Cluster-scoped embedding near-dup pairs — the candidate stage of
    * SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): every vector is assigned to its nearest centroid
    * (argmax cosine, ties toward the lower centroid index), and exact
    * cosine runs ONLY inside each cluster's self-join. Cost is
    * sum(|cluster|^2) instead of n^2: at 100 TB the centroid count is
    * sized so clusters hold ~1e3–1e4 vectors (the paper runs 50k clusters
    * over 1e9 embeddings) and the only corpus-wide work is one broadcast-
    * centroid assignment pass plus one shuffle BY CLUSTER of slim
    * (cluster, id, vec) rows. A pathologically hot cluster (near-identical
    * boilerplate embeddings absorbing most of the corpus) is guarded by
    * the same candidate-volume valve the simhash bridge carries: Σ
    * c·(c−1)/2 over the cluster counts is probed BEFORE the self-join,
    * and past `maxCandidates` candidate generation LOUDLY switches to a
    * random-hyperplane LSH sub-split WITHIN clusters (same exact-cosine
    * verification, candidates restricted to same-cluster pairs).
    * Output: (ida, idb, cluster, cosine) with ida < idb.
    *
    * NOTE: the valve probe makes DataFrame construction EAGER here (the
    * assignment stage-cuts so probe + pair join share one pass). */
  def semanticClusterPairs(df: DataFrame, idCol: String, vecCol: String,
                           centroids: Array[Array[Float]],
                           threshold: Double = 0.95,
                           maxCandidates: Long = 100000000L): DataFrame = {
    val (assigned, aRdd) = graft.core.Materialize.stageCutHandle(
      Similarity.assignClusters(
        df.select(col(idCol).as("id"), col(vecCol).as("v")), "v", centroids))
    val out = guardedPairsFromAssigned(assigned, threshold, maxCandidates)
    aRdd.unpersist(blocking = false) // lineage kept; consumers recompute
    out
  }

  /** Valve-trip counter — spec observability only (OpsSpec asserts the
    * valve fires on a planted hot-cluster corpus and stays silent on the
    * oracle corpora). */
  @volatile private[graft] var semanticValveTrips: Long = 0L

  /** [[pairsFromAssigned]] behind the hot-cluster candidate-volume valve:
    * probe Σ c·(c−1)/2 over the (materialized) assignment's cluster
    * counts — one map-side-combined aggregation of slim rows — and past
    * `maxCandidates` switch candidate generation to multi-table
    * random-hyperplane LSH cells intersected with cluster equality (the
    * "secondary code" sub-split: a hot cluster's self-join volume drops
    * to its LSH-cell co-occupancy, recall governed by the same
    * multi-table + Hamming-1 probing the embedding near-dup path audits).
    * Verification is the same exact unrounded-cosine filter either way. */
  private def guardedPairsFromAssigned(assigned: DataFrame, threshold: Double,
                                       maxCandidates: Long): DataFrame = {
    val vol = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c").cast("double") * (col("c") - 1).cast("double") / 2))
      .head().getAs[Any](0) match {
        case null => 0.0
        case d: java.lang.Double => d.doubleValue()
        case other => other.toString.toDouble
      }
    if (vol <= maxCandidates.toDouble) pairsFromAssigned(assigned, threshold)
    else {
      semanticValveTrips += 1
      System.err.println(f"[graft] WARNING: SemDeDup within-cluster candidate volume " +
        f"~$vol%.3g exceeds maxCandidates=$maxCandidates -- a pathologically hot " +
        "cluster (near-identical embeddings) would make the cluster self-join " +
        "quadratic. Auto-switching candidate generation to a random-hyperplane " +
        "LSH sub-split within clusters (same exact-cosine verification; " +
        "multi-table + Hamming-1 probe recall as in embeddingCosinePairs).")
      val codes = Similarity.codesUdf(tables = 4, bits = 8, dim = 64, seed = 7L)
      val coded = assigned.withColumn("codes", codes(col("v")))
      // candidates carry only (cluster, cell, id); vectors rejoin per side
      val l = coded.select(col("cluster"), col("id").as("ida"),
        explode(Similarity.cellsUdf(4)(col("codes"))).as("cell"))
      val r = coded.select(col("cluster").as("cluster2"), col("id").as("idb"),
        explode(Similarity.probesUdf(4, 8)(col("codes"))).as("cell"))
      l.join(r, l("cell") === r("cell") && col("cluster") === col("cluster2") &&
          col("ida") < col("idb"))
        .select("cluster", "ida", "idb").distinct()
        .join(assigned.select(col("id").as("ida"), col("v").as("va")), Seq("ida"))
        .join(assigned.select(col("id").as("idb"), col("v").as("vb")), Seq("idb"))
        .withColumn("c", Similarity.cosCol(col("va"), col("vb")))
        .filter(col("c") >= threshold)
        .select(col("ida"), col("idb"), col("cluster"), round(col("c"), 4).as("cosine"))
    }
  }

  /** Within-cluster exact-cosine pairs over an already-assigned
    * (id, v, cluster) frame — split out so [[semanticDedup]] pays the
    * per-row nearest-centroid pass exactly ONCE for the pair stage, the
    * survivor stage and the reported cluster column. */
  private def pairsFromAssigned(assigned: DataFrame, threshold: Double): DataFrame = {
    val l = assigned.select(col("cluster"), col("id").as("ida"), col("v").as("va"))
    val r = assigned.select(col("cluster").as("cluster2"), col("id").as("idb"), col("v").as("vb"))
    // threshold on the UNROUNDED cosine; rounding only the reported column
    l.join(r, col("cluster") === col("cluster2") && col("ida") < col("idb"))
      .withColumn("c", Similarity.cosCol(col("va"), col("vb")))
      .filter(col("c") >= threshold)
      .select(col("ida"), col("idb"), col("cluster"), round(col("c"), 4).as("cosine"))
  }

  /** Full SemDeDup: [[Similarity.trainCentroids]] (bounded-sample k-means)
    * -> assignment (ONE nearest-centroid pass, materialized so the pair
    * self-join and the output both read it without re-running the UDF) ->
    * within-cluster exact-cosine pairs -> [[dedupClusters]] survivors.
    * Output: (id, cluster, group, keep) — one `keep` per connected
    * near-dup set, same survivor contract as the other dedup ops.
    * Callers that need oracle-reproducible clustering pass explicit
    * `centroids` (e.g. the first-k-ids seed set the q_semantic_dedup
    * entry uses); production passes None and trains. The materialized
    * assignment stays cached for the session (slim id+cluster+vec rows);
    * long-lived sessions free it via [[semanticDedupHandle]]. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    centroids: Option[Array[Array[Float]]] = None,
                    threshold: Double = 0.95, nClusters: Int = 16,
                    seed: Long = 7L): DataFrame =
    semanticDedupHandle(df, idCol, vecCol, centroids, threshold, nClusters, seed)._1

  /** [[semanticDedup]] plus a cleanup thunk freeing the assignment and
    * component caches once the caller has consumed the result. */
  def semanticDedupHandle(df: DataFrame, idCol: String, vecCol: String,
                          centroids: Option[Array[Array[Float]]] = None,
                          threshold: Double = 0.95, nClusters: Int = 16,
                          seed: Long = 7L,
                          maxCandidates: Long = 100000000L): (DataFrame, () => Unit) = {
    val cents = centroids.getOrElse(
      Similarity.trainCentroids(df.select(col(idCol), col(vecCol)),
        idCol, vecCol, nLists = nClusters, seed = seed))
    val (assigned, aRdd) = graft.core.Materialize.stageCutHandle(
      Similarity.assignClusters(
        df.select(col(idCol).as("id"), col(vecCol).as("v")), "v", cents))
    val (surv, freeCc) = dedupClustersHandle(
      assigned.select("id"), "id",
      guardedPairsFromAssigned(assigned, threshold, maxCandidates))
    val out = assigned.select(col("id").cast("string").as("id"),
        col("cluster").cast("long").as("cluster"))
      .join(surv, Seq("id"))
      .select("id", "cluster", "group", "keep")
    (out, () => { freeCc(); aRdd.unpersist(blocking = false) })
  }
}
