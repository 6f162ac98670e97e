package graft.build

/** Character-recursive text splitter — the TXT ingestion path of the
  * reference reader (eschergraph/builder/reader/reader.py:156-186, which
  * delegates to the public LangChain `RecursiveCharacterTextSplitter`
  * with `chunk_size=1500, chunk_overlap=300`).
  *
  * Faithful re-implementation of that public algorithm with its defaults:
  * separators `["\n\n", "\n", " ", ""]` tried coarsest-first, separators
  * kept attached to the START of the following piece, pieces merged
  * greedily up to `chunkSize` characters with a trailing-window overlap of
  * up to `overlap` characters, merged chunks whitespace-stripped.
  *
  * Pure per-document string function — the Spark stage applies it inside a
  * narrow flatMap ([[Chunker.txtChunks]]), zero shuffle.
  */
object TextSplitter {

  val DefaultSeparators: Seq[String] = Seq("\n\n", "\n", " ", "")

  /** Split `text` into chunks of at most `chunkSize` chars (a single
    * unsplittable piece may exceed it), consecutive chunks overlapping by
    * at most `overlap` chars. */
  def split(text: String, chunkSize: Int, overlap: Int,
            separators: Seq[String] = DefaultSeparators): Vector[String] = {
    require(overlap < chunkSize, "overlap must be smaller than chunkSize")
    splitRec(text, chunkSize, overlap, separators)
  }

  private def splitRec(text: String, chunkSize: Int, overlap: Int,
                       seps: Seq[String]): Vector[String] = {
    // first separator that occurs in the text ("" always matches and
    // degrades to per-character splitting)
    val idx = seps.indexWhere(s => s.isEmpty || text.contains(s))
    val (separator, deeper) =
      if (idx >= 0) (seps(idx), seps.drop(idx + 1))
      else (seps.lastOption.getOrElse(""), Nil)

    val pieces = splitKeepingSeparator(text, separator)
    val out = Vector.newBuilder[String]
    var pending = Vector.empty[String]
    def flush(): Unit = if (pending.nonEmpty) {
      out ++= mergePieces(pending, chunkSize, overlap)
      pending = Vector.empty
    }
    pieces.foreach { p =>
      if (p.length < chunkSize) pending :+= p
      else {
        flush()
        if (deeper.isEmpty) out += p
        else out ++= splitRec(p, chunkSize, overlap, deeper)
      }
    }
    flush()
    out.result()
  }

  /** Split on a literal separator, re-attaching each separator occurrence
    * to the start of the piece that follows it; empty pieces dropped. An
    * empty separator splits into single characters. */
  private[build] def splitKeepingSeparator(text: String, sep: String): Vector[String] =
    if (sep.isEmpty) text.map(_.toString).toVector
    else {
      val parts = text.split(java.util.regex.Pattern.quote(sep), -1)
      (parts.head +: parts.tail.map(sep + _).toVector).filter(_.nonEmpty).toVector
    }

  /** Greedy merge of small pieces into chunks: emit when adding the next
    * piece would exceed `chunkSize`, then slide the window forward from the
    * front until it holds at most `overlap` chars (and fits the next
    * piece). Emitted chunks are whitespace-stripped; all-whitespace merges
    * are dropped. */
  private[build] def mergePieces(pieces: Seq[String], chunkSize: Int,
                                 overlap: Int): Vector[String] = {
    val docs = Vector.newBuilder[String]
    var window = Vector.empty[String]
    var total = 0
    def emit(): Unit = {
      val joined = window.mkString.strip()
      if (joined.nonEmpty) docs += joined
    }
    pieces.foreach { p =>
      if (total + p.length > chunkSize && window.nonEmpty) {
        emit()
        while (total > overlap || (total + p.length > chunkSize && total > 0)) {
          total -= window.head.length
          window = window.tail
        }
      }
      window :+= p
      total += p.length
    }
    emit()
    docs.result()
  }
}
