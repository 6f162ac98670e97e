package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the driver surface itself (no Spark session). */
class EntrySpec extends AnyFunSuite {

  test("every driver query carries a DuckDB oracle") {
    // Round 4 closed the last rows-only gaps (recursive TXT splitter,
    // PageRank iteration unroll, the two media-stub replays); keep the
    // surface total — a new query without an oracle ships a weaker
    // rows-only check and should fail loudly here instead.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.toSeq.sorted}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: ${orphans.toSeq.sorted}")
  }

  test("oracle SQL strings are non-empty and single-statement") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // semicolons outside `--` comment lines would split the driver's
      // single-query execution
      val codeNoComments = sql.linesIterator
        .map(l => l.indexOf("--") match { case -1 => l; case i => l.take(i) })
      assert(codeNoComments.forall(!_.contains(";")),
        s"$name: statement separator outside a comment")
    }
  }
}
