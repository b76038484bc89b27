package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq((1L, 5L), (2L, 10L), (3L, 14L), (4L, 25L), (5L, -3L))
    .toDF("pid", "v")
  // half-open intervals, overlapping, one negative, one empty
  private val intervals = Seq(
    (100L, 0L, 10L),    // catches 5
    (101L, 5L, 15L),    // catches 5, 10, 14
    (102L, 10L, 10L),   // empty: matches nothing
    (103L, -5L, 0L),    // catches -3
    (104L, 20L, 30L))   // catches 25
    .toDF("iid", "lo", "hi")

  private def naive = points.join(intervals,
    col("v") >= col("lo") && col("v") < col("hi"))
    .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed range join equals the naive theta join (several widths)") {
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", bucketWidth = w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucketWidth $w diverged")
    }
  }

  test("each (point, interval) match appears exactly once despite multi-bucket spans") {
    val rows = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", bucketWidth = 2)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size)
  }

  test("random points/intervals equal the naive theta join (seeded)") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 60L).map(i => (i, rnd.nextLong() % 1000)).toDF("pid", "v")
    val ivs = (100L to 140L).map { i =>
      val lo = rnd.nextLong() % 1000
      (i, lo, lo + rnd.nextInt(80)) // includes empty (width 0) intervals
    }.toDF("iid", "lo", "hi")
    val want = pts.join(ivs, col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(13L, 64L)) {
      val got = RangeJoin.bucketed(pts, ivs, "v", "lo", "hi", bucketWidth = w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"width $w diverged")
    }
  }

  test("plan is an equi join on the bucket key, not a nested-loop/cartesian") {
    val plan = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", bucketWidth = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a non-equi plan:\n$plan")
  }
}
