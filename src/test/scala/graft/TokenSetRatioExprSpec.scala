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
