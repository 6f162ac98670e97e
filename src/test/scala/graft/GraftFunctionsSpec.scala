package graft

import graft.functions.{EmbedText, GraftFunctions, TextFns, TokenSetRatio}
import org.apache.spark.sql.functions._

/** SQL function registry: every Column-API custom function is callable
  * from plain SQL with identical results. */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions equal their Column-API twins") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "Hello  WORLD this is text"), (2L, "a b c 12345 !!!"))
      .toDF("id", "t")
    df.createOrReplaceTempView("gfx_docs")
    val viaSql = spark.sql(
      """SELECT id,
        |  token_set_ratio(t, 'hello world') AS tsr,
        |  estimate_tokens(t) AS et,
        |  non_alpha_ratio(t) AS nar,
        |  doc_fingerprint(t) AS fp,
        |  embed_text(t) AS emb
        |FROM gfx_docs""".stripMargin)
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4),
        r.getSeq[Float](5))).sortBy(_._1).toSeq
    val viaApi = df.select(col("id"),
        TokenSetRatio(col("t"), lit("hello world")),
        TextFns.estimateTokensCol(col("t")),
        TextFns.nonAlphaRatioCol(col("t")),
        md5(regexp_replace(trim(lower(col("t"))), "\\s+", " ")),
        EmbedText(col("t")))
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4),
        r.getSeq[Float](5))).sortBy(_._1).toSeq
    assert(viaSql === viaApi)
    // the fingerprint registered in SQL matches the ops-layer fingerprint
    val opsFp = graft.ops.TextAnalysis.fingerprint(df, "id", "t")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    viaSql.foreach { case (id, _, _, _, fp, _) => assert(opsFp(id) === fp) }
    // arity misuse is a loud error, not a silent null
    val err = intercept[Exception](spark.sql("SELECT estimate_tokens('a', 'b')").collect())
    assert(err.getMessage.contains("expects 1 argument"))
  }
}
