package graft

import graft.io.DocSources
import org.apache.spark.sql.functions._

/** JSONL/CSV corpus ingest: explicit-schema reads, corrupt-record
  * quarantine, sharded export round-trip. */
class DocSourcesSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def writeLines(lines: Seq[String], suffix: String): String = {
    val f = java.nio.file.Files.createTempFile("graft-docsrc", suffix)
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("jsonl: good rows parse to the doc schema, bad lines are quarantined with the raw text") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s0", "n_chars": 5}""",
      """{"doc_id": 2, "text": "beta", "lang": "en", "source": "s1", "n_chars": 4}""",
      """this is not json at all""",
      """{"doc_id": "not-a-number", "text": "gamma", "lang": "en", "source": "s2", "n_chars": 5}""",
      """{"doc_id": 3, "text": "delta", "lang": "de", "source": "s0", "n_chars": 5}"""
    ), ".jsonl")
    val (good, bad) = DocSources.jsonl(spark, path)
    assert(good.schema === DocSources.docSchema)
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted === Array(1L, 2L, 3L))
    val rawBad = bad.collect().map(_.getAs[String]("raw_record"))
    assert(rawBad.length === 2)
    assert(rawBad.exists(_.contains("not json at all")))
    assert(rawBad.exists(_.contains("not-a-number")))
  }

  test("csv: header honored, malformed rows quarantined") {
    val path = writeLines(Seq(
      "doc_id,text,lang,source,n_chars",
      "1,alpha,en,s0,5",
      "2,beta,en,s1,4",
      "oops,gamma,en,s2,not-a-count",
      "3,delta,de,s0,5"
    ), ".csv")
    val (good, bad) = DocSources.csv(spark, path)
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted === Array(1L, 2L, 3L))
    assert(bad.count() === 1)
    assert(bad.collect().head.getAs[String]("raw_record").contains("oops"))
  }

  test("csv: header skipping is positional — a data line equal to the header is quarantined, not dropped") {
    val path = writeLines(Seq(
      "doc_id,text,lang,source,n_chars",
      "1,alpha,en,s0,5",
      // a malformed mid-file line that happens to equal the header string:
      // content-based filtering would silently vanish it from BOTH outputs
      "doc_id,text,lang,source,n_chars",
      "2,beta,en,s1,4"
    ), ".csv")
    val (good, bad) = DocSources.csv(spark, path)
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted === Array(1L, 2L))
    val rawBad = bad.collect().map(_.getAs[String]("raw_record"))
    assert(rawBad.length === 1, "the header-lookalike line must land in quarantine")
    assert(rawBad.head.startsWith("doc_id,"))
  }

  test("csv: headerless file keeps its first record") {
    val path = writeLines(Seq(
      "5,epsilon,en,s0,7", // data at byte offset 0 — must survive the read
      "6,zeta,en,s1,4"
    ), ".csv")
    val (good, bad) = DocSources.csv(spark, path)
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted === Array(5L, 6L))
    assert(bad.count() === 0)
  }

  test("csv: a near-miss header (case drift) is quarantined, not silently dropped") {
    val path = writeLines(Seq(
      "Doc_id,text,lang,source,n_chars", // not the expected header byte-for-byte
      "7,eta,en,s0,3"
    ), ".csv")
    val (good, bad) = DocSources.csv(spark, path)
    assert(good.select("doc_id").collect().map(_.getLong(0)) === Array(7L))
    val rawBad = bad.collect().map(_.getAs[String]("raw_record"))
    assert(rawBad.length === 1, "the mismatched header must leave a quarantine trace")
    assert(rawBad.head.startsWith("Doc_id"))
  }

  test("sharded jsonl export round-trips the fixture corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl-out").toString
    DocSources.writeJsonl(docs, out, shards = 4)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".json"))
    assert(files.length === 4, "export must produce exactly the requested shard count")
    val (back, bad) = DocSources.jsonl(spark, out)
    assert(bad.isEmpty)
    assert(back.exceptAll(docs.select(DocSources.docSchema.fieldNames.map(col): _*)).isEmpty)
    assert(docs.select(DocSources.docSchema.fieldNames.map(col): _*).exceptAll(back).isEmpty)
  }
}
