package graft.extract

import graft.core._

/** Pluggable extraction component — the role the LLM plays in the reference
  * (prompts at eschergraph/agents/prompts/json_build.jinja,
  * json_property.jinja, json_table.jinja, json_figure.jinja,
  * json_keywords.jinja, summary.jinja; call sites
  * eschergraph/builder/build_pipeline.py:102-225,310-373).
  *
  * The engine treats this as an opaque batched client executed inside
  * `mapPartitions` with bounded concurrency (reference fans the same calls
  * over a ThreadPoolExecutor with max_threads=10, agents/llm.py:38). Tests
  * and benches inject [[DeterministicExtractor]]; a real deployment would
  * inject an HTTP-backed client with the identical interface.
  */
trait SpanExtractor extends Serializable {
  /** L3: chunk text → entity mentions + relation triples. */
  def extractChunk(text: String): (Seq[NodeExt], Seq[EdgeExt])
  /** L4: chunk text + already-extracted entity names → per-entity properties. */
  def extractProperties(text: String, nodeNames: Seq[String]): Seq[PropertyExt]
  /** L5: markdown table → mentions + triples. */
  def extractTable(markdown: String): (Seq[NodeExt], Seq[EdgeExt])
  /** L6: figure caption → mentions + triples + main visual entity name. */
  def extractFigure(caption: String): (Seq[NodeExt], Seq[EdgeExt], String)
  /** L1: document text → 5-15 keywords. */
  def keywords(fullText: String): Seq[String]
  /** L2: document text → summary. */
  def summary(fullText: String): String
  /** Mirror of the reference's LLM thread pool size (agents/llm.py:38). */
  def maxConcurrency: Int = 10
}

/** Deterministic grammar-inverse extractor. It knows the relation-predicate
  * vocabulary and the copular property pattern (the "language"), but NOT
  * the entity universe: entity surface forms are whatever text surrounds a
  * recognized predicate. This makes the downstream linking /
  * canonicalization stages do real work and keeps end-to-end parity
  * well-defined (SURVEY.md §7.5).
  */
class DeterministicExtractor extends SpanExtractor {
  // CPU-bound (no IO to hide): run inline on the task thread; Spark's
  // task parallelism is the concurrency (see BoundedExec).
  override def maxConcurrency: Int = 1

  // longest-first so "supplies components to" wins over a bare "to", and
  // "is located in" wins over the copular "is" property pattern.
  private val preds: Vector[String] =
    (Corpus.predicates :+ Corpus.figurePred).sortBy(-_.length)

  private def sentences(text: String): Array[String] =
    text.split("[.\\n]+").map(_.trim).filter(_.nonEmpty)

  private def matchRelation(sentence: String): Option[(String, String, String)] = {
    var i = 0
    while (i < preds.length) {
      val p = preds(i)
      val idx = sentence.indexOf(" " + p + " ")
      if (idx > 0) {
        val subj = sentence.substring(0, idx).trim
        val obj = sentence.substring(idx + p.length + 2).trim
        if (subj.nonEmpty && obj.nonEmpty) return Some((subj, p, obj))
      }
      i += 1
    }
    None
  }

  override def extractChunk(text: String): (Seq[NodeExt], Seq[EdgeExt]) = {
    val nodes = Vector.newBuilder[NodeExt]
    val edges = Vector.newBuilder[EdgeExt]
    sentences(text).foreach { s =>
      matchRelation(s) match {
        case Some((a, p, b)) =>
          nodes += NodeExt(a, s)
          nodes += NodeExt(b, s)
          edges += EdgeExt(a, b, p)
        case None =>
          // heading mention ("Part N concerning X") — an entity's FIRST
          // (full-form) mention can sit in a section header; skipping it
          // would truncate the canonical form for the whole document
          val cIdx = s.indexOf(" concerning ")
          if (cIdx > 0 && s.startsWith("Part ")) {
            val name = s.substring(cIdx + " concerning ".length).trim
            if (name.nonEmpty) nodes += NodeExt(name, s)
          } else {
            val idx = s.indexOf(" is ")
            if (idx > 0) nodes += NodeExt(s.substring(0, idx).trim, s)
          }
      }
    }
    (dedupNodes(nodes.result()), edges.result())
  }

  override def extractProperties(text: String, nodeNames: Seq[String]): Seq[PropertyExt] = {
    val known = nodeNames.map(_.toLowerCase).toSet
    val acc = scala.collection.mutable.LinkedHashMap[String, Vector[String]]()
    sentences(text).foreach { s =>
      if (matchRelation(s).isEmpty) {
        val idx = s.indexOf(" is ")
        if (idx > 0) {
          val subj = s.substring(0, idx).trim
          val prop = s.substring(idx + 4).trim
          if (prop.nonEmpty && known.contains(subj.toLowerCase)) {
            acc(subj) = acc.getOrElse(subj, Vector.empty) :+ prop
          }
        }
      }
    }
    acc.map { case (n, ps) => PropertyExt(n, ps.distinct) }.toVector
  }

  override def extractTable(markdown: String): (Seq[NodeExt], Seq[EdgeExt]) = {
    val nodes = Vector.newBuilder[NodeExt]
    val edges = Vector.newBuilder[EdgeExt]
    markdown.split("\n").foreach { line =>
      val t = line.trim
      if (t.startsWith("|") && !t.contains("---")) {
        val cells = t.stripPrefix("|").stripSuffix("|").split("\\|").map(_.trim)
        if (cells.length == 3 && Corpus.predicates.contains(cells(1))) {
          nodes += NodeExt(cells(0), t)
          nodes += NodeExt(cells(2), t)
          edges += EdgeExt(cells(0), cells(2), cells(1))
        }
      }
    }
    (dedupNodes(nodes.result()), edges.result())
  }

  override def extractFigure(caption: String): (Seq[NodeExt], Seq[EdgeExt], String) = {
    val body = caption.replaceFirst("^Figure \\d+:\\s*", "")
    matchRelation(body.stripSuffix(".").trim) match {
      case Some((a, p, b)) =>
        (Seq(NodeExt(a, caption), NodeExt(b, caption)), Seq(EdgeExt(a, b, p)), a)
      case None => (Nil, Nil, "")
    }
  }

  override def keywords(fullText: String): Seq[String] = {
    // top capitalized terms by frequency — 5..15 per reference prompt
    val caps = "\\b[A-Z][a-z]+\\b".r.findAllIn(fullText).toSeq
      .filterNot(w => w == "Part" || w == "Figure" || w == "Dr")
    caps.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(10).map(_._1)
  }

  override def summary(fullText: String): String =
    sentences(fullText).take(2).mkString(". ") + "."

  private def dedupNodes(ns: Seq[NodeExt]): Seq[NodeExt] = {
    val seen = scala.collection.mutable.Set[String]()
    ns.filter(n => seen.add(n.name.toLowerCase))
  }
}

/** Bounded-concurrency batch executor for per-partition "LLM" fan-out —
  * the Spark-side analog of the reference's ThreadPoolExecutor pattern
  * (build_pipeline.py:103,192,311). A pool of `concurrency` threads per
  * partition, shut down when the partition iterator is exhausted.
  */
object BoundedExec {
  def mapBounded[A, B](it: Iterator[A], concurrency: Int, batchSize: Int = 64)(
      f: A => B): Iterator[B] = {
    if (!it.hasNext) return Iterator.empty
    // concurrency exists to hide per-call LATENCY (LLM/HTTP clients). A
    // CPU-bound extractor declares maxConcurrency=1 and takes the direct
    // path: task parallelism already saturates the cores, and a pool per
    // partition would only add oversubscription.
    if (concurrency <= 1) return it.map(f)
    // DAEMON threads + task-completion shutdown: pool.shutdown() on
    // exhaustion alone would leak the (otherwise non-daemon) threads
    // forever whenever f throws out of hasNext or a downstream
    // limit()/take() abandons the iterator mid-partition — each task retry
    // would then stack a fresh parked pool on a long-lived executor.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency,
      (r: Runnable) => { val t = new Thread(r, "graft-bounded-exec"); t.setDaemon(true); t })
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
    val batches = it.grouped(batchSize)
    new Iterator[B] {
      private var cur: Iterator[B] = Iterator.empty
      private var closed = false
      override def hasNext: Boolean = {
        while (!cur.hasNext && batches.hasNext) {
          val batch = batches.next()
          val futures = batch.map(a => pool.submit(new java.util.concurrent.Callable[B] {
            override def call(): B = f(a)
          }))
          try cur = futures.map(_.get()).iterator
          catch { case e: Throwable => pool.shutdownNow(); closed = true; throw e }
        }
        val has = cur.hasNext
        if (!has && !closed) { pool.shutdown(); closed = true }
        has
      }
      override def next(): B = {
        if (!hasNext) throw new NoSuchElementException
        cur.next()
      }
    }
  }
}

/** Raw pre-property log (reference keeps chunk_text on BuildLog,
  * builder/build_log.py:40-49; we carry it between L3 and L4 then drop). */
case class RawLog(
    doc_id: String,
    chunk_id: Int,
    is_visual: Boolean,
    chunk_text: String,
    nodes: Seq[NodeExt],
    edges: Seq[EdgeExt],
    main_visual_entity: String,
    media_ref: String = "",
    visual_kind: String = "")

object Extract {
  import org.apache.spark.sql.Dataset

  /** L3 + L5/L6: chunks and visual spans → raw logs. Visual logs get
    * chunk_id = 100000 + span offset (disjoint from text chunk ids, which
    * the reference models as chunk_id=None + visual metadata). */
  val VisualChunkBase = 100000

  def rawLogs(chunks: Dataset[Chunk], visuals: Dataset[(String, Span)],
              extractor: SpanExtractor): Dataset[RawLog] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val fromChunks = chunks.mapPartitions { it =>
      BoundedExec.mapBounded(it, extractor.maxConcurrency) { c =>
        val (ns, es) = extractor.extractChunk(c.text)
        RawLog(c.doc_id, c.chunk_id, is_visual = false, c.text, ns, es, "")
      }
    }
    val fromVisuals = visuals.mapPartitions { it =>
      BoundedExec.mapBounded(it, extractor.maxConcurrency) { case (docId, span) =>
        val (ns, es, main) = span.kind match {
          case Kinds.Table =>
            val (n, e) = extractor.extractTable(span.text); (n, e, "")
          case _ => extractor.extractFigure(span.text)
        }
        RawLog(docId, VisualChunkBase + span.offset, is_visual = true, span.text, ns, es, main,
          media_ref = span.media_ref, visual_kind = span.kind)
      }
    }
    fromChunks.union(fromVisuals)
  }

  /** L4: property extraction over raw logs → final extraction logs. */
  def withProperties(raw: Dataset[RawLog], extractor: SpanExtractor): Dataset[ExtractionLog] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.mapPartitions { it =>
      BoundedExec.mapBounded(it, extractor.maxConcurrency) { r =>
        val props =
          if (r.is_visual) Seq.empty[PropertyExt]
          else extractor.extractProperties(r.chunk_text, r.nodes.map(_.name))
        ExtractionLog(r.doc_id, r.chunk_id, r.is_visual, r.nodes, r.edges, props,
          r.main_visual_entity, r.media_ref, r.visual_kind)
      }
    }
  }
}
