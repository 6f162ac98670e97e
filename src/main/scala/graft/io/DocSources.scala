package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-corpus sources and sinks beyond parquet: JSONL and CSV, the
  * formats a web-scale training corpus actually arrives in.
  *
  * Design rules for 100 TB ingest:
  *   - ALWAYS pass an explicit schema — schema inference is a second full
  *     pass over the input before the first real one;
  *   - never drop malformed input silently: PERMISSIVE mode with a corrupt-
  *     record column splits the read into (good, quarantine) so a bad
  *     shard is visible and replayable, and a `badRecordsPath`-style audit
  *     needs no second read;
  *   - export re-shards explicitly — downstream trainers want a bounded
  *     file count, not one file per upstream shuffle partition.
  */
object DocSources {

  /** The documents-table schema (TESTDATA.md / input_hint shape). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val Corrupt = "_corrupt_record"
  private def withCorrupt(s: StructType) = s.add(StructField(Corrupt, StringType))
  private val parseOpts =
    Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt)

  /** JSONL corpus read → (good, quarantine). Good rows carry exactly
    * [[docSchema]]; quarantine rows carry the raw offending line.
    *
    * Lines are read as text and parsed with `from_json` rather than the
    * json reader: the reader's internal corrupt-record column cannot be
    * referenced on its own (QueryCompilationErrors forbids it, and the
    * documented workaround is caching the whole read — wrong at 100 TB),
    * while a `from_json` struct field is an ordinary column. One scan,
    * two filters, no cache. */
  def jsonl(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    split(spark.read.text(path).filter(length(trim(col("value"))) > 0)
      .select(col("value"),
        from_json(col("value"), withCorrupt(docSchema), parseOpts).as("d")))

  /** CSV corpus read with a header line, same quarantine contract as
    * [[jsonl]]. Line-oriented (`from_csv` over text lines), so quoted
    * embedded newlines are not supported — corpus exports don't use them.
    *
    * Header skipping is POSITIONAL **and validated**: only the first line
    * of a file (byte offset 0), and only when it equals the expected
    * header, is dropped. An unconditional positional skip would silently
    * lose the first RECORD of every headerless export (a file whose first
    * line is data) — the exact silent loss the (good, quarantine) split
    * exists to prevent — while a purely content-based skip would drop a
    * malformed data line that happens to render identical to the header
    * anywhere in the file. Combining both signals leaves exactly one safe
    * drop; a near-miss header (case drift, reordered columns) at offset 0
    * is fed to the parser and lands in quarantine with its raw text, so
    * the mismatch is visible and replayable instead of vanishing. (A
    * stray trailing CR is trimmed before the compare — CRLF exports keep
    * their header recognized.)
    * The only positional signal a distributed text scan has is the record
    * BYTE OFFSET, which the Hadoop text input format exposes and the SQL
    * text source does not — the one-hop RDD read below is that (the
    * "unless forced" case; everything downstream is ordinary Catalyst).
    * `from_csv` over text is used instead of the native csv reader because
    * the reader's internal corrupt-record column cannot survive column
    * pruning (counting the quarantine frame fails analysis with
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN, and the documented workaround is
    * caching the whole read — wrong at 100 TB), while a `from_csv` struct
    * field is an ordinary column. */
  def csv(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
    val lines = spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text])
      // materialize to String immediately: the record reader REUSES its
      // Text buffer across records
      .map { case (off, t) => (off.get(), t.toString) }
    val headerLine = docSchema.fieldNames.mkString(",")
    // rtrim the CR explicitly BEFORE the compare: the Hadoop
    // LineRecordReader already strips \r from CRLF lines, but that is an
    // input-format detail this predicate must not silently depend on —
    // any future line source that preserves the CR keeps its header
    // recognized (trim() alone removes only spaces).
    val line = trim(rtrim(col("value"), "\r"))
    split(spark.createDataFrame(lines).toDF("off", "value")
      .filter(length(line) > 0 &&
        !(col("off") === 0 && line === headerLine))
      .select(col("value"),
        from_csv(col("value"), withCorrupt(docSchema), parseOpts).as("d")))
  }

  private def split(parsed: DataFrame): (DataFrame, DataFrame) = {
    // a totally unparseable line may come back as a NULL struct rather
    // than a populated corrupt column, depending on the parser — treat both
    // as quarantine
    val isBad = col("d").isNull || col("d").getField(Corrupt).isNotNull
    val good = parsed.filter(!isBad)
      .select(docSchema.fieldNames.map(f => col("d").getField(f).as(f)): _*)
    val quarantine = parsed.filter(isBad)
      .select(col("value").as("raw_record"),
        col("d").getField("doc_id").as("doc_id"))
    (good, quarantine)
  }

  /** Sharded JSONL export of a curated corpus: exactly `shards` output
    * files regardless of the upstream partitioning. Round-robin
    * repartition, not coalesce — coalesce would chain the export onto the
    * upstream partition count and can starve parallelism upstream of it. */
  def writeJsonl(df: DataFrame, path: String, shards: Int): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.repartition(shards).write.mode("overwrite").json(path)
  }
}
