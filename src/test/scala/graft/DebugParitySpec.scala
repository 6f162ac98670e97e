package graft

import graft.core._
import graft.extract.DeterministicExtractor
import graft.pipeline.BuildPipeline
import org.apache.spark.sql.functions._

class DebugParitySpec extends SparkSpec {
  ignore("dump mismatches") {
    val nDocs = 400L
    val result = BuildPipeline.run(Corpus.docs(spark, nDocs), new DeterministicExtractor)
    val oracle = Corpus.oracleTriples(spark, nDocs).toDF()
    val got = result.triples.select("doc_id", "subj", "pred", "obj").distinct().cache()
    val exp = oracle.select("doc_id", "subj", "pred", "obj").distinct().cache()
    println("=== SPURIOUS (got - oracle) ===")
    got.except(exp).orderBy("doc_id", "subj").show(40, false)
    println("=== MISSING (oracle - got) ===")
    exp.except(got).orderBy("doc_id", "subj").show(40, false)
  }
}
