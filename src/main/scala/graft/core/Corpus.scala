package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.Random

/** Deterministic synthetic corpus of interleaved text+media documents,
  * shaped exactly like BASELINE.json input_hint:
  * (doc_id, spans: array<struct<kind,text,media_ref,offset>>).
  *
  * The generation grammar is invertible: every relation sentence, table row
  * and figure caption corresponds to one canonical (subj, pred, obj)
  * triple, so the expected triple set per doc is known by construction —
  * this is the oracle for the P/R >= 0.95 parity gate (BASELINE.json
  * north_rule). Entities appear under several surface forms (full name,
  * token-subset aliases) so entity linking + canonicalization have real
  * work, and a small set of "celebrity" entities appears in a large
  * fraction of docs to exercise skew handling.
  *
  * Generation is per-doc seeded (seed ^ docIdx) and runs inside
  * mapPartitions over spark.range — embarrassingly parallel, no driver-side
  * materialization, so the same generator scales to bench-size corpora.
  */
object Corpus {

  // --- vocabulary pools (fixed; names disjoint from predicate words) ----
  private val firsts = Vector(
    "Elena", "Marcus", "Priya", "Hiroshi", "Amara", "Viktor", "Ingrid", "Rafael",
    "Mei", "Tobias", "Zara", "Dmitri", "Leila", "Anders", "Chiara", "Omar",
    "Freya", "Mateo", "Anika", "Stefan", "Yuki", "Imogen", "Carlos", "Saskia",
    "Nadia", "Henrik", "Paloma", "Igor", "Sofia", "Emil")
  private val lasts = Vector(
    "Vasquez", "Lindqvist", "Okafor", "Tanaka", "Petrov", "Moreau", "Castellanos",
    "Nakamura", "Fitzgerald", "Johansson", "Mbeki", "Rossini", "Kowalski",
    "Ferreira", "Hartmann", "Oyelaran", "Bergstrom", "Delacroix", "Novak",
    "Ashworth", "Medina", "Sorensen", "Takahashi", "Villanueva", "Eriksen",
    "Montgomery", "Abernathy", "Castillo", "Whitfield", "Larsson", "Pemberton",
    "Ricci", "Galloway", "Hummel", "Obradovic", "Santiago", "Kjellberg",
    "Duarte", "Winslow", "Farrokh")
  private val orgHeads = Vector(
    "Vertex", "Solstice", "Meridian", "Aurora", "Cobalt", "Zenith", "Halcyon",
    "Obsidian", "Lumina", "Cascade", "Pinnacle", "Quantica", "Borealis",
    "Ember", "Trellis", "Vanguard", "Citadel", "Horizon", "Velocity", "Crucible")
  private val orgMids = Vector(
    "Analytics", "Robotics", "Biotech", "Dynamics", "Materials", "Logistics",
    "Semiconductors", "Energy", "Genomics", "Photonics", "Aerospace", "Capital")
  private val orgSuffixes = Vector("Group", "Labs", "Corporation", "Institute", "Partners", "Holdings")

  /** Relation predicate vocabulary — the extractor knows these phrases
    * (like an LLM knows language) but NOT the entity universe. */
  val predicates: Vector[String] = Vector(
    "collaborates with", "acquired", "supplies components to", "works at",
    "founded", "partners with", "invested in", "advises", "competes with",
    "employs", "reports to", "is located in", "licensed technology from",
    "mentors", "spun out of")

  val propertyPhrases: Vector[String] = Vector(
    "a leading research organization", "headquartered in the northern district",
    "an expert in distributed systems", "a nonprofit foundation",
    "a veteran of the semiconductor industry", "a publicly traded company",
    "a pioneer in computational biology", "an early stage venture fund",
    "a recipient of the innovation medal", "a specialist in supply chain optimization",
    "a founding member of the standards consortium", "an advocate for open research")

  val figurePred = "is depicted with"

  /** An entity with its canonical name and token-subset aliases.
    * `key` is the distinguishing token used to keep in-doc clusters
    * unambiguous (persons: last name; orgs: head word). */
  final case class Entity(canonical: String, aliases: Vector[String], key: String, isOrg: Boolean)

  /** Deterministic entity universe. Persons and orgs; no entity's token set
    * is a subset of another's (so token-subset aliases resolve uniquely
    * within the universe). */
  def universe(size: Int, seed: Long): Vector[Entity] = {
    val rng = new Random(seed)
    val out = Vector.newBuilder[Entity]
    val seenNames = scala.collection.mutable.Set[String]()
    val tokenSets = scala.collection.mutable.ArrayBuffer[Set[String]]()
    var made = 0
    var attempts = 0
    while (made < size && attempts < size * 50) {
      attempts += 1
      val isOrg = rng.nextDouble() < 0.4
      val (canonical, key) =
        if (isOrg) {
          val h = orgHeads(rng.nextInt(orgHeads.size))
          val m = orgMids(rng.nextInt(orgMids.size))
          val s = orgSuffixes(rng.nextInt(orgSuffixes.size))
          (s"$h $m $s", h)
        } else {
          val f = firsts(rng.nextInt(firsts.size))
          val l = lasts(rng.nextInt(lasts.size))
          val titled = rng.nextDouble() < 0.3
          (if (titled) s"Dr $f $l" else s"$f $l", l)
        }
      val toks = canonical.toLowerCase.split(" ").toSet
      val clash = seenNames.contains(canonical) ||
        tokenSets.exists(t => t.subsetOf(toks) || toks.subsetOf(t))
      if (!clash) {
        seenNames += canonical
        tokenSets += toks
        val aliases =
          if (isOrg) {
            val parts = canonical.split(" ")
            Vector(canonical, parts.take(2).mkString(" "), parts.head)
          } else {
            val parts = canonical.split(" ")
            val noTitle = if (parts.head == "Dr") parts.drop(1).mkString(" ") else canonical
            Vector(canonical, noTitle, parts.last).distinct
          }
        out += Entity(canonical, aliases, key.toLowerCase, isOrg)
        made += 1
      }
    }
    out.result()
  }

  final case class OracleTriple(doc_id: String, subj: String, pred: String, obj: String)

  /** Everything generated for one doc: the input row and its expected
    * canonical triples (distinct). */
  final case class GenDoc(row: DocRow, oracle: Vector[OracleTriple])

  def docId(idx: Long): String = f"doc-$idx%08d"

  private val CelebCount = 8

  /** Generate one document deterministically from (seed, idx, universe). */
  def genDoc(idx: Long, seed: Long, univ: Vector[Entity]): GenDoc = {
    val rng = new Random(seed * 1000003L + idx)
    val id = docId(idx)

    // pick 4..9 entities; celebrities (first CelebCount of the universe)
    // chosen with probability 0.35 → heavy skew on those names.
    val ambiguousDoc = rng.nextDouble() < 0.02
    val nEnt = 4 + rng.nextInt(6)
    val picked = scala.collection.mutable.ArrayBuffer[Entity]()
    val usedKeys = scala.collection.mutable.Set[String]()
    var guard = 0
    while (picked.size < nEnt && guard < 200) {
      guard += 1
      val e =
        if (rng.nextDouble() < 0.35) univ(rng.nextInt(CelebCount))
        else univ(rng.nextInt(univ.size))
      val keyOk = ambiguousDoc || !usedKeys.contains(e.key)
      if (keyOk && !picked.exists(_.canonical == e.canonical)) {
        picked += e
        usedKeys += e.key
      }
    }
    val ents = picked.toVector
    def pickEnt(): Entity = ents(rng.nextInt(ents.size))
    // First mention of an entity in a doc uses the full canonical form
    // (as real documents do); later mentions may abbreviate. This makes
    // "canonical = maximal mentioned surface form" well-defined per doc.
    val introduced = scala.collection.mutable.Set[String]()
    def alias(e: Entity): String = {
      val first = introduced.add(e.canonical)
      if (first) e.canonical else e.aliases(rng.nextInt(e.aliases.size))
    }

    val oracle = Vector.newBuilder[OracleTriple]
    val sentences = scala.collection.mutable.ArrayBuffer[String]()

    // relation sentences
    val nRel = 8 + rng.nextInt(18)
    var r = 0
    while (r < nRel) {
      val a = pickEnt()
      var b = pickEnt()
      var g2 = 0
      while (b.canonical == a.canonical && g2 < 20) { b = pickEnt(); g2 += 1 }
      if (b.canonical != a.canonical) {
        val p = predicates(rng.nextInt(predicates.size))
        sentences += s"${alias(a)} $p ${alias(b)}."
        oracle += OracleTriple(id, a.canonical, p, b.canonical)
      }
      r += 1
    }
    // property sentences
    val nProp = 3 + rng.nextInt(6)
    var pi = 0
    while (pi < nProp) {
      val e = pickEnt()
      val ph = propertyPhrases(rng.nextInt(propertyPhrases.size))
      sentences += s"${alias(e)} is $ph."
      pi += 1
    }
    // deterministic shuffle of sentence order
    val ordered = rng.shuffle(sentences.toVector)

    // group into text spans of 2..4 sentences, interleave headers
    val spans = scala.collection.mutable.ArrayBuffer[Span]()
    var offset = 0
    var i = 0
    var section = 1
    while (i < ordered.size) {
      if (rng.nextDouble() < 0.25) {
        spans += Span(Kinds.SectionHeader, s"Part $section concerning ${alias(pickEnt())}", "", offset)
        offset += 1
        section += 1
      }
      val take = math.min(2 + rng.nextInt(3), ordered.size - i)
      spans += Span(Kinds.Text, ordered.slice(i, i + take).mkString(" "), "", offset)
      offset += 1
      i += take
    }
    // tables: 0..2, each 2..4 relation rows as markdown
    val nTab = rng.nextInt(3)
    var t = 0
    while (t < nTab) {
      val rows = 2 + rng.nextInt(3)
      val sb = new StringBuilder("| subject | relation | object |\n| --- | --- | --- |\n")
      var tr = 0
      while (tr < rows) {
        val a = pickEnt()
        var b = pickEnt()
        var g3 = 0
        while (b.canonical == a.canonical && g3 < 20) { b = pickEnt(); g3 += 1 }
        if (b.canonical != a.canonical) {
          val p = predicates(rng.nextInt(predicates.size))
          sb.append(s"| ${alias(a)} | $p | ${alias(b)} |\n")
          oracle += OracleTriple(id, a.canonical, p, b.canonical)
        }
        tr += 1
      }
      spans += Span(Kinds.Table, sb.toString, s"img://$id/table-$t.png", offset)
      offset += 1
      t += 1
    }
    // figures: 0..2, caption encodes one triple
    val nFig = rng.nextInt(3)
    var f = 0
    while (f < nFig) {
      val a = pickEnt()
      var b = pickEnt()
      var g4 = 0
      while (b.canonical == a.canonical && g4 < 20) { b = pickEnt(); g4 += 1 }
      if (b.canonical != a.canonical) {
        spans += Span(Kinds.Figure, s"Figure ${f + 1}: ${alias(a)} $figurePred ${alias(b)}.", s"img://$id/fig-$f.png", offset)
        oracle += OracleTriple(id, a.canonical, figurePred, b.canonical)
        offset += 1
      }
      f += 1
    }
    GenDoc(DocRow(id, spans.toVector), oracle.result().distinct)
  }

  val DefaultSeed = 42L
  val DefaultUniverseSize = 400

  /** Distributed generation of the input table. */
  def docs(spark: SparkSession, nDocs: Long, seed: Long = DefaultSeed,
           universeSize: Int = DefaultUniverseSize): Dataset[DocRow] = {
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    spark.range(0L, nDocs, 1L, parts).mapPartitions { it =>
      val univ = universe(universeSize, seed)
      it.map(i => genDoc(i, seed, univ).row)
    }
  }

  /** Distributed oracle: expected canonical triples, distinct per doc. */
  def oracleTriples(spark: SparkSession, nDocs: Long, seed: Long = DefaultSeed,
                    universeSize: Int = DefaultUniverseSize): Dataset[OracleTriple] = {
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    spark.range(0L, nDocs, 1L, parts).mapPartitions { it =>
      val univ = universe(universeSize, seed)
      it.flatMap(i => genDoc(i, seed, univ).oracle)
    }
  }

  /** Corpus size by testdata scale-factor dir name (sf0.001 → 60 docs,
    * sf0.01 → 600, sf0.1 → 6000); fallback 200. */
  def docsForSfDir(sfDir: String): Long = {
    val m = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
    // math.round, not truncation: 0.29 * 60000 is 17399.999… in binary
    // floating point, and toLong would yield one doc fewer than sf*60000
    m.map(g => math.max(60L, math.round(g.group(1).toDouble * 60000))).getOrElse(200L)
  }
}
