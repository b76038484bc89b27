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

  test("temperatureWeights: alpha=0.5 flattens toward uniform, invariants hold") {
    // masses 9000/900/100: natural shares 0.9/0.09/0.01
    val d = Seq(("big", 9000L), ("mid", 900L), ("small", 100L)).toDF("source", "ntok")
    val out = MixtureSample.temperatureWeights(d, "source", "ntok", targetTokens = 10000L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("mass"), r.getAs[Double]("p"), r.getAs[Double]("q"),
         r.getAs[Double]("weight"), r.getAs[Double]("epochs"))).toMap
    assert(out("big")._1 == 9000L && out("small")._1 == 100L)
    // q sums to 1; p sums to 1
    assert(math.abs(out.values.map(_._3).sum - 1.0) < 1e-12)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-12)
    // flattening: the dominant source is down-weighted, the rare one boosted
    assert(out("big")._4 < 1.0 && out("small")._4 > 1.0)
    // monotone: flattened shares preserve the mass order
    assert(out("big")._3 > out("mid")._3 && out("mid")._3 > out("small")._3)
    // epochs = q*target/mass: small source needs multiple passes to fill its slice
    assert(out("small")._5 > 1.0 && out("big")._5 < 1.0)
  }

  test("temperatureWeights: alpha=1 is natural sampling (weight 1, q=p)") {
    val d = Seq(("a", 600L), ("b", 300L), ("c", 100L)).toDF("source", "ntok")
    val out = MixtureSample.temperatureWeights(d, "source", "ntok", 1000L, alpha = 1.0)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("p"), r.getAs[Double]("q"), r.getAs[Double]("weight"))).toMap
    out.foreach { case (_, (p, q, w)) =>
      assert(math.abs(q - p) < 1e-12 && math.abs(w - 1.0) < 1e-12)
    }
  }

  test("temperatureWeights is deterministic under repartition") {
    val rng = new scala.util.Random(7)
    val d = (0 until 500).map(i => (s"g${i % 7}", (rng.nextInt(200) + 1).toLong))
      .toDF("source", "ntok")
    def run(df: org.apache.spark.sql.DataFrame) =
      MixtureSample.temperatureWeights(df, "source", "ntok", 100000L)
        .collect().map(r => (r.getAs[String]("source"), r.getAs[Double]("q"),
          r.getAs[Double]("epochs"))).toSet
    assert(run(d) == run(d.repartition(17)), "doubles must be bit-identical across plans")
  }

  test("systematicSample draws ~k total with per-row copies proportional within 1") {
    val rng = new scala.util.Random(31)
    val rows = (0L until 400L).map(i => (i, (rng.nextInt(50) + 1).toLong)).toDF("id", "w")
    val k = 60L
    val out = MixtureSample.systematicSample(rows, "id", "w", k)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("w"), r.getAs[Long]("copies")))
    val total = out.map(_._3).sum
    assert(total == k || total == k - 1, s"total draw $total vs k=$k")
    val w = rows.collect().map(r => r.getLong(1)).sum
    val step = (w + k - 1) / k
    out.foreach { case (id, wi, c) =>
      assert(c >= wi / step && c <= wi / step + 1,
        s"row $id: copies $c outside [${wi / step}, ${wi / step + 1}] for w=$wi step=$step")
    }
  }

  test("systematicSample guarantees selection for rows with weight >= step") {
    // one whale of weight 1000 among minnows of 1: whale must be drawn
    // with ~proportional multiplicity
    val rows = ((0L until 99L).map(i => (i, 1L)) :+ (999L, 1000L)).toDF("id", "w")
    val out = MixtureSample.systematicSample(rows, "id", "w", k = 20L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("copies")).toMap
    val step = (1099L + 19L) / 20L // 55
    assert(out.contains(999L) && out(999L) >= 1000L / step,
      s"whale got ${out.get(999L)} copies, expected >= ${1000L / step}")
  }

  test("systematicSample is deterministic under repartition") {
    val rng = new scala.util.Random(37)
    val rows = (0L until 300L).map(i => (i, (rng.nextInt(30) + 1).toLong)).toDF("id", "w")
    def run(df: org.apache.spark.sql.DataFrame) =
      MixtureSample.systematicSample(df, "id", "w", 40L)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum"),
          r.getAs[Long]("copies"))).toSet
    assert(run(rows) == run(rows.repartition(13)))
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

  test("stratifiedFixedK takes exactly min(k,|g|) per group, deterministically") {
    val rows = (1L to 100L).map(i => (i, s"g${i % 4}")) ++ Seq((200L, "tiny"))
    val df = rows.toDF("id", "grp")
    def run(d: org.apache.spark.sql.DataFrame) =
      MixtureSample.stratifiedFixedK(d, "grp", "id", k = 5)
        .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("rk"), r.getAs[Long]("id"))).toSet
    val base = run(df)
    assert(base.count(_._1 == "tiny") == 1) // |g| < k → whole group
    Seq("g0", "g1", "g2", "g3").foreach(g => assert(base.count(_._1 == g) == 5))
    assert(run(df.repartition(11)) == base, "hash order is partitioning-invariant")
    // ranks are 1..k within each group
    base.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq.sorted == (1L to rows.size))
    }
  }

  test("stratifiedFixedK plans a map-side partial top-k (WindowGroupLimit below the exchange)") {
    val df = (1L to 50L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val plan = MixtureSample.stratifiedFixedK(df, "grp", "id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
    // Partial mode instance precedes the shuffle read side
    assert(plan.contains("Partial"), s"expected a Partial window-group-limit in:\n$plan")
  }

  test("weightedSampleNoReplacement returns exactly k rows, deterministic under repartition") {
    val df = (1L to 200L).map(i => (i, 1L + i % 17)).toDF("id", "w")
    val a = MixtureSample.weightedSampleNoReplacement(df, "id", "w", k = 20)
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    val b = MixtureSample.weightedSampleNoReplacement(df.repartition(13), "id", "w", k = 20)
      .collect().map(_.getAs[Long]("id")).sorted.toSeq
    assert(a.length == 20)
    assert(a == b, "selection must not depend on physical layout")
    assert(a.distinct.length == 20, "without replacement: no id sampled twice")
  }

  test("weightedSampleNoReplacement favors heavy rows (A-ES inclusion ∝ weight)") {
    // 10 rows of weight 1000 among 200 of weight 1: P(include heavy) ≈ 1
    // for k=10 — all heavy rows should make the sample with overwhelming
    // probability under ANY uniform draw; md5 draws are fixed, so this is
    // a deterministic regression pin of the weighting direction.
    val df = ((1L to 200L).map(i => (i, 1L)) ++ (201L to 210L).map(i => (i, 100000L)))
      .toDF("id", "w")
    val picked = MixtureSample.weightedSampleNoReplacement(df, "id", "w", k = 10)
      .collect().map(_.getAs[Long]("id")).toSet
    assert((201L to 210L).count(picked) >= 9,
      s"heavy rows must dominate the top-k, got $picked")
  }

  test("leakageSafeSplit: group-cohesive, threshold-exact, re-salt re-draws") {
    val df = (1L to 400L).map(i => (i, s"grp${i % 40}")).toDF("id", "grp")
    val out = MixtureSample.leakageSafeSplit(df, "grp", valPermille = 200,
      testPermille = 100).collect()
    // every group lands whole in exactly one split
    val byGrp = out.groupBy(_.getAs[String]("grp"))
      .map { case (g, rs) => g -> rs.map(_.getAs[String]("split")).toSet }
    assert(byGrp.values.forall(_.size == 1), s"split straddles a group: $byGrp")
    // thresholds are exact functions of the bucket
    out.foreach { r =>
      val b = r.getAs[Long]("split_bucket"); val s = r.getAs[String]("split")
      assert(b >= 0 && b < 1000)
      val want = if (b < 100) "test" else if (b < 300) "val" else "train"
      assert(s == want, s"bucket $b -> $s, want $want")
    }
    // determinism + re-salting independence
    val again = MixtureSample.leakageSafeSplit(df, "grp", 200, 100).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    val salted = MixtureSample.leakageSafeSplit(df, "grp", 200, 100, salt = "v2")
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("split_bucket")).toMap
    val orig = out.map(r => r.getAs[String]("grp") -> r.getAs[Long]("split_bucket")).toMap
    assert(orig != salted, "a new salt must re-draw the buckets")
    // degenerate permilles: everything train / everything test
    assert(MixtureSample.leakageSafeSplit(df, "grp", 0, 0)
      .select("split").distinct().collect().map(_.getString(0)).toSeq == Seq("train"))
    assert(MixtureSample.leakageSafeSplit(df, "grp", 0, 1000)
      .select("split").distinct().collect().map(_.getString(0)).toSeq == Seq("test"))
  }

  test("weightedSampleNoReplacement plans as TakeOrdered (no global sort)") {
    val df = (1L to 100L).map(i => (i, 1L + i % 5)).toDF("id", "w")
    val plan = MixtureSample.weightedSampleNoReplacement(df, "id", "w", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("weightedDrawsWithReplacement: exactly one item per draw, mass tracks weight, zero weight never drawn") {
    val items = Seq(("a", 1L), ("b", 3L), ("c", 0L), ("d", -2L)).toDF("item", "w")
    val out = MixtureSample.weightedDrawsWithReplacement(items, "item", "w", nDraws = 400L)
      .collect().map(r => r.getAs[Long]("j") -> r.getAs[String]("item"))
    assert(out.length == 400 && out.map(_._1).distinct.length == 400) // each draw exactly once
    val byItem = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(!byItem.contains("c") && !byItem.contains("d"))
    // b has 3× a's weight: md5-uniform draws put b's share near 300/400
    assert(byItem("b") > 250 && byItem("b") < 350, s"b drawn ${byItem("b")}")
    assert(byItem("a") + byItem("b") == 400)
    // deterministic: same salt → identical draw sequence
    val again = MixtureSample.weightedDrawsWithReplacement(items, "item", "w", nDraws = 400L)
      .collect().map(r => r.getAs[Long]("j") -> r.getAs[String]("item"))
    assert(out.toSeq.sorted == again.toSeq.sorted)
  }
}
