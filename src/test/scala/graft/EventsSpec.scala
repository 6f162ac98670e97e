package graft

import graft.ops.Events
import org.apache.spark.sql.functions._

/** Temporal event operators: gap sessionization and the as-of join. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val events = spark.read.parquet(s"$sf/events.parquet").cache()

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("sessionize: gap-inclusive semantics, counts and bounds by hand") {
    val gap = "30 minutes" // 1800 s; session_window merges at diff == gap
    val d = Seq(
      (1L, ts(0), 1L, 1.0), (2L, ts(100), 1L, 2.0),   // user 1, session A
      (3L, ts(100 + 1799), 1L, 3.0),                  // diff 1799 < gap → A
      (4L, ts(100 + 1799 + 1800), 1L, 4.0),           // diff == gap → still A
      (5L, ts(100 + 1799 + 1800 + 1801), 1L, 5.0),    // diff > gap → session B
      (6L, ts(0), 2L, 10.0)                           // user 2, alone
    ).toDF("event_id", "ts", "user_id", "value")
    val got = Events.sessionize(d, "user_id", "ts", gap)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us")) ->
        (r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      .toMap
    assert(got.size === 3)
    assert(got((1L, 0L)) === ((3699L * 1000000L, 4L, 10.0)))
    assert(got((1L, 5500L * 1000000L)) === ((5500L * 1000000L, 1L, 5.0)))
    assert(got((2L, 0L)) === ((0L, 1L, 10.0)))
  }

  test("sessionize matches a lag-cumsum replay on the fixture events") {
    val got = Events.sessionize(events, "user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // independent replay: per-user sort, split on gap STRICTLY > 1800s
    val byUser = events.select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    val replay = byUser.flatMap { case (u, tss) =>
      val sessions = tss.tail.foldLeft(Vector(Vector(tss.head))) { (acc, t) =>
        if (t - acc.last.last > 1800L * 1000000L) acc :+ Vector(t)
        else acc.init :+ (acc.last :+ t)
      }
      sessions.map(s => (u, s.head, s.last, s.size.toLong))
    }.toSet
    assert(got === replay)
  }

  test("asofJoin: ties, simultaneity, and missing-right by hand") {
    val right = Seq(
      (100L, ts(10), 1L), (101L, ts(10), 1L), // equal-ts views → max id (101) wins
      (102L, ts(50), 1L),
      (103L, ts(30), 2L)
    ).toDF("event_id", "ts", "user_id")
    val left = Seq(
      (200L, ts(10), 1L),  // simultaneous view visible → 101
      (201L, ts(49), 1L),  // latest earlier view → 101 (102 is later)
      (202L, ts(50), 1L),  // exactly-at view → 102
      (203L, ts(5), 2L),   // nothing before → nulls
      (204L, ts(31), 2L)   // → 103
    ).toDF("event_id", "ts", "user_id")
    val got = Events.asofJoin(left, right, "user_id", "ts", "event_id")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Long]("right_id")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("lag_us")).map(_.toLong))).toMap
    assert(got(200L) === ((Some(101L), Some(0L))))
    assert(got(201L) === ((Some(101L), Some(39L * 1000000L))))
    assert(got(202L) === ((Some(102L), Some(0L))))
    assert(got(203L) === ((None, None)))
    assert(got(204L) === ((Some(103L), Some(1L * 1000000L))))
  }

  test("asofJoin matches brute force on the fixture events (clicks vs views)") {
    val clicks = events.filter(col("event_type") === "click")
    val views = events.filter(col("event_type") === "view")
    val got = Events.asofJoin(clicks, views, "user_id", "ts", "event_id")
      .collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getAs[java.lang.Long]("right_id")).map(_.toLong))
      .toMap
    val vs = views.select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val brute = clicks.select(col("event_id"), col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map { r =>
        val cands = vs.getOrElse(r.getLong(1), Array.empty[(Long, Long, Long)])
          .filter(_._2 <= r.getLong(2))
        r.getLong(0) -> (if (cands.isEmpty) None
                         else Some(cands.maxBy(v => (v._2, v._3))._3))
      }.toMap
    assert(got === brute)
    assert(got.nonEmpty && got.values.exists(_.isDefined))
  }
}
