package graft

import graft.core._
import graft.materialize.GlobalCatalog
import org.apache.spark.sql.functions._

/** Salted two-phase rollup (north_rule skew handling): must be exactly
  * semantics-preserving vs the single-phase groupBy, including on a
  * celebrity-skewed corpus where one name appears in most docs. */
class GlobalCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def meta(doc: String, chunks: Int) = (0 until chunks).map(Meta(doc, _))

  test("salted catalog equals the naive single-phase rollup (skewed fixture)") {
    // celebrity "vertex analytics" in 40 docs; long-tail names in 1-2 docs
    val rows =
      (0 until 40).map(i => NodeRow(s"n-celeb-$i", "Vertex Analytics", "d", 0,
        is_visual = false, "", Seq(), meta(f"doc-$i%04d", 1 + i % 3))) ++
      (0 until 25).map(i => NodeRow(s"n-t$i", s"Entity $i", "d", 0,
        is_visual = false, "", Seq(), meta(f"doc-${i * 2}%04d", 1))) ++
      Seq(NodeRow("c1", "a community", "", 1, is_visual = false, "", Seq(), meta("doc-0000", 1)))
    val nodes = rows.toDF()

    val salted = GlobalCatalog.entityCatalog(nodes, salts = 7)
      .orderBy("name_norm").collect().map(_.toSeq)
    val naive = GlobalCatalog.entityCatalogNaive(nodes)
      .orderBy("name_norm").collect().map(_.toSeq)
    assert(salted.length === 26) // level-1 row excluded
    assert(salted.toSeq === naive.toSeq)

    val celeb = GlobalCatalog.entityCatalog(nodes, salts = 7)
      .filter(col("name_norm") === "vertex analytics").head()
    assert(celeb.getAs[Long]("n_docs") === 40L)
    assert(celeb.getAs[Seq[String]]("sample_doc_ids").size === GlobalCatalog.SampleCap)
    assert(celeb.getAs[Seq[String]]("sample_doc_ids").head === "doc-0000")
  }

  test("catalog on a real build surfaces the planted celebrities as top names") {
    val r = graft.SparkEntry.kg(spark, "/root/testdata/sf0.001")
    val top = GlobalCatalog.entityCatalog(r.nodes)
      .orderBy(col("n_docs").desc, col("name_norm").asc)
      .limit(8).collect()
    // the corpus plants 8 celebrity entities in ~35% of docs each; the
    // top-8 catalog entries must each cover well above the ~2% long tail
    assert(top.length === 8)
    assert(top.forall(_.getAs[Long]("n_docs") >= 10L))
  }
}
