package graft.app
import graft.core.Corpus
import graft.extract.DeterministicExtractor
import graft.pipeline.BuildPipeline
import org.apache.spark.sql.SparkSession
object ParityDebug {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 150L
    val seed = if (args.length > 1) args(1).toLong else 20260816L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = BuildPipeline.run(Corpus.docs(spark, n, seed), new DeterministicExtractor)
    val got = r.triples.select("doc_id", "subj", "pred", "obj").distinct().cache()
    val exp = Corpus.oracleTriples(spark, n, seed).toDF().distinct().cache()
    println("=== SPURIOUS ==="); got.except(exp).orderBy("doc_id", "subj").show(30, false)
    println("=== MISSING ==="); exp.except(got).orderBy("doc_id", "subj").show(30, false)
    spark.stop()
  }
}
