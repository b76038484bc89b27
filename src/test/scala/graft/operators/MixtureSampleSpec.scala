package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSampleSpec extends SparkSpec {
  import spark.implicits._

  test("tokenBudgetSample picks the priority-order prefix within each group's budget") {
    // group a: prio order is (1,100tok)(2,100)(3,100) with budget 250 —
    // the row that would cross the boundary (3) is excluded
    // group b: budget covers everything
    val rows = Seq(
      (1L, "a", 100L, 10L), (2L, "a", 100L, 20L), (3L, "a", 100L, 30L),
      (4L, "b", 50L, 5L), (5L, "b", 50L, 15L)).toDF("id", "grp", "ntok", "prio")
    val budgets = Seq(("a", 250L), ("b", 1000L)).toDF("grp", "budget")
    val out = MixtureSample.tokenBudgetSample(rows, "grp", "ntok", "prio", budgets, "grp", "budget")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("picked")).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true, 5L -> true))
  }

  test("tokenBudgetSample honors priority order, not id order") {
    // reversed priorities: the LAST ids come first in the prefix
    val rows = Seq(
      (1L, "a", 100L, 30L), (2L, "a", 100L, 20L), (3L, "a", 100L, 10L)).toDF("id", "grp", "ntok", "prio")
    val budgets = Seq(("a", 150L)).toDF("grp", "budget")
    val out = MixtureSample.tokenBudgetSample(rows, "grp", "ntok", "prio", budgets, "grp", "budget")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("picked")).toMap
    assert(out == Map(3L -> true, 2L -> false, 1L -> false))
  }

  test("rows from groups absent from the budget table are dropped (inner-join semantics)") {
    val rows = Seq((1L, "known", 10L, 1L), (2L, "unknown", 10L, 2L)).toDF("id", "grp", "ntok", "prio")
    val budgets = Seq(("known", 100L)).toDF("grp", "budget")
    val out = MixtureSample.tokenBudgetSample(rows, "grp", "ntok", "prio", budgets, "grp", "budget")
      .collect().map(_.getAs[Long]("id"))
    assert(out.toSeq == Seq(1L), "unbudgeted group must not appear in the output")
  }

  test("tokenBudgetSample is deterministic under repartition") {
    val rng = new scala.util.Random(3)
    val rows = (0L until 200L).map { i =>
      (i, s"g${i % 4}", (rng.nextInt(50) + 1).toLong, (i * 48271L) % 2147483648L)
    }.toDF("id", "grp", "ntok", "prio")
    val budgets = Seq(("g0", 300L), ("g1", 500L), ("g2", 100L), ("g3", 0L)).toDF("grp", "budget")
    def run(df: org.apache.spark.sql.DataFrame) =
      MixtureSample.tokenBudgetSample(df, "grp", "ntok", "prio", budgets, "grp", "budget")
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("picked"))).toSet
    val base = run(rows)
    assert(run(rows.repartition(13)) == base)
    // empty budget picks nothing from g3
    assert(base.collect { case (id, true) if id % 4 == 3 => id }.isEmpty)
  }
}
