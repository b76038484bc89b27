package graft.functions

import java.sql.Timestamp
import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

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
}
