package graft.functions

import java.sql.Timestamp
import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2History: change compression, interval chaining, open current version") {
    val log = Seq(
      // u1: A -> A (no change, compressed) -> B -> A
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "A"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "B"),
      (1L, ts("2024-01-01 13:00:00"), 4L, "A"),
      // u2: single record -> one open version
      (2L, ts("2024-01-01 09:00:00"), 5L, "X"),
      // u3: equal timestamps, seq breaks the tie -> C then D
      (3L, ts("2024-01-01 08:00:00"), 6L, "C"),
      (3L, ts("2024-01-01 08:00:00"), 7L, "D")
    ).toDF("user_id", "ts", "event_id", "status")
    val got = EventOps.scd2History(log, "user_id", "ts", "event_id", Seq("status"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("status"),
        r.getAs[Timestamp]("effective_from"), r.getAs[Timestamp]("effective_to"),
        r.getAs[Boolean]("is_current"))).toSet
    assert(got == Set(
      (1L, "A", ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), false),
      (1L, "B", ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00"), false),
      (1L, "A", ts("2024-01-01 13:00:00"), null, true),
      (2L, "X", ts("2024-01-01 09:00:00"), null, true),
      (3L, "C", ts("2024-01-01 08:00:00"), ts("2024-01-01 08:00:00"), false),
      (3L, "D", ts("2024-01-01 08:00:00"), null, true)))
  }

  test("funnel: strict event-time order, per-user existential semantics") {
    val events = Seq(
      // u1 completes the funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      // u2's click precedes its view: no qualifying click
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      (2L, ts("2024-01-01 09:45:00"), "purchase"),
      // u3's purchase precedes its qualifying click: stops at step 2
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:10:00"), "purchase"),
      (3L, ts("2024-01-01 08:20:00"), "click"),
      // u4 only views
      (4L, ts("2024-01-01 07:00:00"), "view"),
      // u5: click at the SAME instant as the view — strict > rejects it
      (5L, ts("2024-01-01 06:00:00"), "view"),
      (5L, ts("2024-01-01 06:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")

    val got = EventOps.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Long, String, Long, Long)].collect.toSeq
    assert(got == Seq(
      (1L, "view", 5L, 1000L),
      (2L, "click", 2L, 400L), // u1, u3
      (3L, "purchase", 1L, 200L))) // u1 only
  }

  test("funnel: a later view can re-qualify a click (earliest qualifier is a running min)") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:06:00"), "view"), // irrelevant second view
      (1L, ts("2024-01-01 10:07:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Long, String, Long, Long)].collect.toSeq
    assert(got.map(_._3) == Seq(1L, 1L, 1L))
  }

  test("cohort retention: first-event week is the cohort; offsets count active weeks") {
    val events = Seq(
      // u1: cohort = week of Mon 2024-01-01, active again two weeks later
      (1L, ts("2024-01-02 10:00:00"), "view"),
      (1L, ts("2024-01-16 10:00:00"), "view"),
      // u2: same cohort week, active the next week
      (2L, ts("2024-01-07 10:00:00"), "view"), // Sunday, still week of 01-01
      (2L, ts("2024-01-08 10:00:00"), "view"),
      // u3: later cohort
      (3L, ts("2024-01-08 11:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")

    val got = EventOps.cohortRetention(events, "user_id", "ts")
      .withColumn("cohort_week",
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("cohort_week"), "yyyy-MM-dd"))
      .as[(String, Long, Long, Long)].collect.toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L, 1000L),
      ("2024-01-01", 1L, 1L, 500L), // u2 in week of 01-08
      ("2024-01-01", 2L, 1L, 500L), // u1 in week of 01-15
      ("2024-01-08", 0L, 1L, 1000L)))
  }

  test("anomalyZ flags a spike against the trailing integer baseline") {
    // hours 10..13: counts 2,2,2,2 (baseline); hour 14: spike of 10
    def at(h: Int, m: Int) = ts(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = (for {
      h <- 10 to 13; m <- Seq(5, 35)
    } yield (1L, at(h, m), "click")) ++
      (0 until 10).map(m => (1L, at(14, m + 1), "click"))
    val out = EventOps.anomalyZ(rows.toDF("user_id", "ts", "event_type"),
      "event_type", "ts", lookback = 4)
      .collect().map(r => (r.getAs[Long]("hidx"), r.getAs[Long]("cnt"),
        Option(r.getAs[java.lang.Long]("z_milli")).map(_.toLong)))
    // only hour 14 has a full 4-hour baseline
    assert(out.length == 1)
    val (_, cnt, z) = out.head
    assert(cnt == 10L)
    // baseline all 2s → zero variance → NULL z
    assert(z.isEmpty)
  }

  test("anomalyZ z-score matches the closed form on a varied baseline") {
    def at(h: Int, k: Int) = ts(f"2024-01-01 $h%02d:${k * 7 + 1}%02d:00")
    // counts per hour 8..11: 1,2,3,2 ; hour 12: 6
    val counts = Seq(8 -> 1, 9 -> 2, 10 -> 3, 11 -> 2, 12 -> 6)
    val rows = counts.flatMap { case (h, c) => (0 until c).map(k => (1L, at(h, k), "e")) }
    val out = EventOps.anomalyZ(rows.toDF("user_id", "ts", "event_type"),
      "event_type", "ts", lookback = 4)
      .collect().map(r => (r.getAs[Long]("cnt"), r.getAs[Long]("z_milli")))
    assert(out.length == 1)
    val (n, s, ssq) = (4L, 8L, 18L) // baseline 1,2,3,2
    val expected = math.round(1000.0 * (6 * n - s) / math.sqrt((n * ssq - s * s).toDouble))
    assert(out.head == ((6L, expected)))
    // sanity: mean 2, var 0.5 → z = 4/sqrt(0.5) ≈ 5.657
    assert(expected == 5657L)
  }

  test("cusumFixed matches the textbook recurrence against a known target") {
    // counts [3,1,1,4,4,1], mu0=2, slack=0: y=[1,-1,-1,2,2,-1],
    // P=[1,0,-1,1,3,2], S = P - min(0, runmin P) = [1,0,0,2,4,3]
    def at(h: Int, m: Int) = ts(f"2024-01-01 $h%02d:$m%02d:00")
    val counts = Seq(3, 1, 1, 4, 4, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(m => (1L, at(h, m + 1), "click")) }
    val out = EventOps.cusumFixed(rows.toDF("user_id", "ts", "event_type"),
      "event_type", "ts", mu0 = 2L, slack = 0L, threshold = 3L)
      .collect().sortBy(_.getAs[Long]("hidx"))
    assert(out.map(_.getAs[Long]("cusum")).toList == List(1L, 0L, 0L, 2L, 4L, 3L))
    assert(out.map(_.getAs[Boolean]("alarm")).toList ==
      List(false, false, false, false, true, false))
    // equals the direct max(0, S+y) fold for any slack
    val direct = counts.scanLeft(0L) { (s, x) => math.max(0L, s + (x - 2L - 1L)) }.tail
    val slacked = EventOps.cusumFixed(rows.toDF("user_id", "ts", "event_type"),
      "event_type", "ts", mu0 = 2L, slack = 1L)
      .collect().sortBy(_.getAs[Long]("hidx")).map(_.getAs[Long]("cusum"))
    assert(slacked.toList == direct)
  }

  test("cusum matches the hand-computed max(0, S+drift) recurrence") {
    // one key, hourly counts [1,1,1,5,5]: n=5, T=13, slack=0 →
    // y = 5x−13 = [-8,-8,-8,12,12]; P = [-8,-16,-24,-12,0];
    // S·n = P − min(0, runmin P) = [0,0,0,12,24]; S = [0,0,0,2.4,4.8]
    def at(h: Int, m: Int) = ts(f"2024-01-01 $h%02d:$m%02d:00")
    val counts = Seq(1, 1, 1, 5, 5)
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(m => (1L, at(h, m + 1), "click")) }
    val out = EventOps.cusum(rows.toDF("user_id", "ts", "event_type"),
      "event_type", "ts", slack = 0L, threshold = 3L)
      .collect().sortBy(_.getAs[Long]("hidx"))
      .map(r => (r.getAs[Long]("cusum_scaled"), r.getAs[Boolean]("alarm")))
    assert(out.map(_._1).toList == List(0L, 0L, 0L, 12L, 24L))
    // h=3 in scaled units is 15: only the final S=4.8 alarms
    assert(out.map(_._2).toList == List(false, false, false, false, true))
    // recurrence sanity vs a direct fold (slack 1 → y = 5x−13−5)
    val slacked = EventOps.cusum(rows.toDF("user_id", "ts", "event_type"),
      "event_type", "ts", slack = 1L, threshold = 3L)
      .collect().sortBy(_.getAs[Long]("hidx")).map(_.getAs[Long]("cusum_scaled"))
    val direct = counts.scanLeft(0L) { (s, x) =>
      math.max(0L, s + (5L * x - 13L - 5L)) }.tail
    assert(slacked.toList == direct)
  }
}
