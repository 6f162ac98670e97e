package graft

import graft.functions.{TextFns, TokenSetRatio}
import org.apache.spark.sql.functions._

/** Native token_set_ratio expression: codegen path must agree with the
  * Scala function and the interpreted path; SQL registration works. */
class TokenSetRatioExprSpec extends SparkSpec {
  import spark.implicits._

  val cases = Seq(
    ("Lennart", "Lennart Timmermans"),
    ("Dr Elena Vasquez", "elena vasquez"),
    ("Elena Vasquez", "Elena Park"),
    ("Vertex Analytics Group", "Solstice Analytics Group"),
    ("", "anything"),
    ("same", "same"))

  test("column expression equals the Scala function (codegen path)") {
    // enough rows to go through whole-stage codegen compilation
    val df = (1 to 50).flatMap(_ => cases).toDF("a", "b")
    val got = df.select(col("a"), col("b"), TokenSetRatio(col("a"), col("b")).as("r"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    got.foreach { case (a, b, r) => assert(r === TextFns.tokenSetRatio(a, b), s"($a, $b)") }
  }

  test("null inputs yield null") {
    val df = Seq((Some("x"), None: Option[String]), (None, Some("y"))).toDF("a", "b")
    val rs = df.select(TokenSetRatio(col("a"), col("b")).as("r")).collect()
    assert(rs.forall(_.isNullAt(0)))
  }

  test("EmbedText expression equals TextFns.embed (codegen path, no boxing)") {
    val texts = Seq("alpha beta gamma", "", "Vertex Analytics Group", "the of and")
    val df = (1 to 50).flatMap(_ => texts).toDF("t")
    val got = df.select(col("t"), graft.functions.EmbedText(col("t")).as("v"))
      .collect().map(r => (r.getString(0), r.getSeq[Float](1).toArray))
    got.foreach { case (t, v) => assert(v.toSeq === TextFns.embed(t).toSeq, t) }
  }

  test("SpanHashes equals the composed-HOF window hashing it replaced (grouping-equivalent)") {
    // the expression's job is GROUPING: two windows hash equal iff their
    // k-token strings are equal — check against driver-side string windows
    val texts = Seq("A, b c! d e", "a b c x y", "p q r p q r p q", "s t", "", "  ,,  ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select(col("id"), graft.functions.SpanHashes(col("t"), 3).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def windows(t: String): Seq[String] =
      t.replaceAll("[^a-zA-Z0-9]+", " ").toLowerCase.split(" ").filter(_.nonEmpty)
        .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
    // same count per doc, and hash equality == string equality across ALL windows
    val pairs = rows.flatMap { case (id, t) => windows(t).zip(got(id)) }
    assert(rows.forall { case (id, t) => windows(t).size == got(id).size })
    for ((s1, h1) <- pairs; (s2, h2) <- pairs)
      assert((s1 == s2) === (h1 == h2), s"'$s1' vs '$s2'")
  }

  test("WordGrams equals the composed-builtin gram construction it replaced") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = df.select(col("doc_id"),
        graft.functions.WordGramsFn(coalesce(col("text"), lit("")), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val composed = df.select(col("doc_id"), {
        val words = filter(split(lower(coalesce(col("text"), lit(""))), "\\s+"), w => w =!= "")
        when(size(words) >= 2,
          transform(sequence(lit(1), size(words) - lit(1)),
            i => concat_ws(" ", slice(words, i, lit(2)))))
          .otherwise(array().cast("array<string>"))
      }.as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native === composed)
  }

  test("SQL registration via function registry / extensions builder") {
    TokenSetRatio.register(spark)
    val r = spark.sql(
      "SELECT token_set_ratio('Lennart', 'Lennart Timmermans') AS r").head().getInt(0)
    assert(r === 100)
    // the extensions hook uses the same builder
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(TokenSetRatio.builder(Seq(Literal("a"), Literal("a"))) != null)
  }
}
