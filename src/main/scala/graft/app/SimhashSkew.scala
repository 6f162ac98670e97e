package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: simhash band-bucket skew at a given bandBits on the
  * sf0.1 documents — sum(count^2) over buckets is the candidate-join row
  * volume the verified simhash pays. */
object SimhashSkew {
  def main(args: Array[String]): Unit = {
    val bandBits = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val bands = 64 / bandBits
    val mask = (1L << bandBits) - 1
    val sim = udf((t: String) => graft.functions.TextFns.simhash64(t))
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), sim(col("text")).as("sig"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> struct(b as band, shiftright(sig, b*$bandBits) & ${mask}L as bv))")).as("bb"))
      .groupBy(col("bb.band"), col("bb.bv")).count()
    val top = df.orderBy(desc("count")).limit(10).collect()
    val vol = df.agg(sum(col("count") * col("count"))).head().getLong(0)
    println(s"[skew] bandBits=$bandBits buckets=${df.count()} candidateVolume=$vol top=${top.map(r => s"${r.getInt(0)}:${r.getLong(1)}=${r.getLong(2)}").mkString(" ")}")
    spark.stop()
  }
}
