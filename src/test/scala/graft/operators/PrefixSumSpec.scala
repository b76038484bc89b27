package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, group: Seq[String]) = {
    val w = Window.partitionBy(group.map(col): _*).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum("v").over(w))
      .select("g", "k", "v", "cum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("grouped running sum equals the naive window, across bucket counts") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 500L).map { k =>
      (if (k % 3 == 0) "en" else if (k % 3 == 1) "fr" else "de", k, rnd.nextInt(100).toLong)
    }.toDF("g", "k", "v")
    val want = naive(df, Seq("g"))
    for (b <- Seq(1, 2, 7, 32, 1000)) {
      val got = PrefixSum.groupedRunningSum(df, Seq("g"), "k", "v", "cum", buckets = b)
        .select("g", "k", "v", "cum").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == want, s"buckets=$b diverged")
    }
  }

  test("skewed groups: one group holding almost all rows still sums exactly") {
    val df = ((1L to 400L).map(k => ("en", k, 7L)) ++ Seq(("fr", 1000L, 5L)))
      .toDF("g", "k", "v")
    val got = PrefixSum.groupedRunningSum(df, Seq("g"), "k", "v", "cum", buckets = 8)
      .where($"g" === "en").agg(max("cum")).as[Long].head()
    assert(got == 400L * 7L)
    val fr = PrefixSum.groupedRunningSum(df, Seq("g"), "k", "v", "cum", buckets = 8)
      .where($"g" === "fr").select("cum").as[Long].head()
    assert(fr == 5L)
  }

  test("negative keys and values") {
    val df = Seq(("a", -5L, -2L), ("a", -1L, 3L), ("a", 4L, -7L), ("b", 0L, 1L))
      .toDF("g", "k", "v")
    val got = PrefixSum.groupedRunningSum(df, Seq("g"), "k", "v", "cum", buckets = 4)
      .select("g", "k", "cum").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", -5L, -2L), ("a", -1L, 1L), ("a", 4L, -6L), ("b", 0L, 1L)))
  }

  test("plan shape: data shuffles on (bucket, group), offsets are broadcast") {
    val df = (1L to 200L).map(k => ("en", k, 1L)).toDF("g", "k", "v")
    val plan = PrefixSum.groupedRunningSum(df, Seq("g"), "k", "v", "cum", buckets = 8)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"offsets join is not broadcast:\n$plan")
    // the data-side window must partition by the bucket column, never by
    // the group alone (that would rebuild the single-reducer shape)
    assert(plan.contains("__psb"), s"bucketed window key missing:\n$plan")
  }
}
