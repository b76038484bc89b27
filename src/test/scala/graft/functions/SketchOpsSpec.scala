package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private val words = {
    val rng = new scala.util.Random(13)
    (0 until 2000).map(_ => s"w${rng.nextInt(50)}")
  }

  test("cms never under-counts, even under forced collisions") {
    val df = words.toDF("word")
    val truth = words.groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    // width 4 << 50 keys: heavy collisions guaranteed
    val sketch = SketchOps.cmsBuild(df, "word", depth = 3, width = 4)
    val est = SketchOps.cmsEstimate(df.distinct(), "word", sketch, depth = 3, width = 4)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[Long]("est")).toMap
    assert(est.keySet == truth.keySet)
    truth.foreach { case (w, c) =>
      assert(est(w) >= c, s"$w under-counted: ${est(w)} < $c")
    }
    // with only 4 buckets something must collide and over-count
    assert(truth.exists { case (w, c) => est(w) > c })
  }

  test("cms is exact when the table is wide enough to avoid collisions") {
    val df = Seq.fill(7)("a").++(Seq.fill(3)("b")).toDF("word")
    val sketch = SketchOps.cmsBuild(df, "word", depth = 4, width = 4096)
    val est = SketchOps.cmsEstimate(df.distinct(), "word", sketch, depth = 4, width = 4096)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[Long]("est")).toMap
    assert(est == Map("a" -> 7L, "b" -> 3L))
  }

  test("sketch size is bounded by depth x width regardless of key cardinality") {
    val df = (0 until 5000).map(i => s"unique$i").toDF("word")
    val sketch = SketchOps.cmsBuild(df, "word", depth = 4, width = 64)
    assert(sketch.count() <= 4L * 64L)
  }

  test("cms is deterministic under repartition") {
    val df = words.toDF("word")
    def run(d: org.apache.spark.sql.DataFrame) = {
      val sk = SketchOps.cmsBuild(d, "word", depth = 4, width = 32)
      SketchOps.cmsEstimate(d.distinct(), "word", sk, 4, 32)
        .collect().map(r => (r.getAs[String]("word"), r.getAs[Long]("est"))).toSet
    }
    assert(run(df) == run(df.repartition(9)))
  }

  private def joinEst(a: Seq[String], b: Seq[String], width: Int): Long =
    SketchOps.cmsJoinSize(
      SketchOps.cmsBuild(a.toDF("word"), "word", 4, width),
      SketchOps.cmsBuild(b.toDF("word"), "word", 4, width))
      .head().getAs[Long]("est")

  private def exactJoin(a: Seq[String], b: Seq[String]): Long = {
    val fb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    a.groupBy(identity).map { case (k, v) => v.size.toLong * fb.getOrElse(k, 0L) }.sum
  }

  test("cmsJoinSize never under-estimates and is exact without collisions") {
    val a = Seq.fill(5)("x") ++ Seq.fill(2)("y") ++ Seq("z")
    val b = Seq.fill(3)("x") ++ Seq.fill(4)("w") ++ Seq("y")
    assert(exactJoin(a, b) == 5L * 3 + 2L * 1)
    assert(joinEst(a, b, width = 4096) == exactJoin(a, b))
    // narrow sketch: collisions only ADD cross terms
    assert(joinEst(a, b, width = 4) >= exactJoin(a, b))
  }

  test("cmsJoinSize on disjoint key sets is zero when wide enough") {
    val a = (0 until 50).map(i => s"a$i")
    val b = (0 until 50).map(i => s"b$i")
    assert(joinEst(a, b, width = 4096) == 0L)
  }

  private def hllEst(keys: Seq[String], p: Int = 10): Long =
    SketchOps.hllEstimate(
      SketchOps.hllRegisters(keys.toDF("k"), "k", p), p).head().getAs[Long]("est")

  test("hll linear-counting branch is near-exact at small cardinality") {
    // linear counting m·ln(m/V) rounds to n ± the collision adjustment
    // (40 distinct registers → 1024·ln(1024/984) ≈ 40.8)
    val e40 = hllEst((1 to 40).map(i => s"key$i"))
    assert(math.abs(e40 - 40L) <= 1, s"got $e40")
    assert(hllEst(Seq.fill(500)("same") ++ Seq("other")) == 2L)
  }

  test("hll raw-branch error stays within 4 sigma of 1.04/sqrt(m)") {
    val n = 20000
    val est = hllEst((1 to n).map(i => s"item-$i-x"))
    val sigma = 1.04 / math.sqrt(1024.0) * n
    assert(math.abs(est - n) < 4 * sigma, s"est $est vs $n (sigma $sigma)")
  }

  test("hll shard merge (max per register) equals the whole-set sketch") {
    val a = (1 to 3000).map(i => s"a$i")
    val b = (2000 to 5000).map(i => s"a$i") // overlapping shards
    val whole = SketchOps.hllRegisters((a ++ b).toDF("k"), "k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sharded = SketchOps.hllRegisters(
        (a.map(("s1", _)) ++ b.map(("s2", _))).toDF("shard", "k"), "k",
        groupCols = Seq("shard"))
      .groupBy("idx").agg(org.apache.spark.sql.functions.max("mx").as("mx"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(whole == sharded)
  }

  test("hll is insensitive to duplication and partitioning") {
    val keys = (1 to 1000).map(i => s"dup$i")
    val once = hllEst(keys)
    assert(hllEst(keys ++ keys ++ keys) == once)
    val est2 = SketchOps.hllEstimate(
      SketchOps.hllRegisters(keys.toDF("k").repartition(13), "k"))
      .head().getAs[Long]("est")
    assert(est2 == once)
  }

  test("kmv: exact below k, sane truncated estimates, overlap detects shared keys") {
    // groups: a = {x0..x199}, b = {x100..x299} (true J = 1/3), c = 10 keys
    val rows = (0 until 200).map(i => ("a", s"x$i")) ++
      (100 until 300).map(i => ("b", s"x$i")) ++
      (0 until 10).map(i => ("c", s"y$i"))
    val df = rows.toDF("g", "k")
    val sk = SketchOps.kmvSketch(df, "g", "k", k = 16)
    val byG = sk.collect().map(r => r.getAs[String]("g") ->
      ((r.getAs[scala.collection.Seq[Long]]("ks").toList, r.getAs[Long]("nd")))).toMap
    // below-k group keeps ALL values; truncated groups keep exactly k sorted
    assert(byG("c")._1.length == 10 && byG("c")._2 == 10)
    assert(byG("a")._1.length == 16 && byG("a")._2 == 200)
    assert(byG("a")._1 == byG("a")._1.sorted)
    val stats = SketchOps.kmvPairStats(sk, k = 16).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) -> r).toMap
    assert(stats.size == 3)
    val ab = stats(("a", "b"))
    // truncated estimate within ~3 std errors (σ ≈ n/√(k−2) ≈ 53 for n=200)
    assert(math.abs(ab.getAs[Long]("est_a") - 200L) <= 160,
      s"est_a ${ab.getAs[Long]("est_a")}")
    // 100 shared keys of 300 union: overlap must be visible, union ballpark
    assert(ab.getAs[Long]("sketch_overlap") > 0)
    assert(math.abs(ab.getAs[Long]("est_union") - 300L) <= 240)
    // disjoint pair: zero overlap, exact small side
    val ac = stats(("a", "c"))
    assert(ac.getAs[Long]("sketch_overlap") == 0 &&
      ac.getAs[Long]("jaccard_milli") == 0 &&
      ac.getAs[Long]("est_intersection") == 0)
    assert(ac.getAs[Long]("est_b") == 10)
    assert(stats(("b", "c")).getAs[Long]("sketch_overlap") == 0)
    // merge theorem fixed point: sketch of the union == merged sketches
    val unionDf = rows.filter(r => r._1 != "c").map(r => ("u", r._2)).toDF("g", "k")
    val uk = SketchOps.kmvSketch(unionDf, "g", "k", k = 16).collect()
      .head.getAs[scala.collection.Seq[Long]]("ks").toList
    val merged = (byG("a")._1 ++ byG("b")._1).distinct.sorted.take(16)
    assert(uk == merged)
  }

  test("ddHistogram/ddQuantiles: relative-error guarantee; sum-merge parity") {
    // log-uniform-ish values 1..1000 per group
    val rnd = new scala.util.Random(11)
    val vals = (1 to 2000).map(_ => ("a", math.max(1L,
      math.round(math.exp(rnd.nextDouble() * math.log(1000.0)))))) ++
      (1 to 500).map(i => ("b", i.toLong))
    val df = vals.toDF("src", "v")
    val hist = SketchOps.ddHistogram(df, "src", "v").localCheckpoint(true)
    // bin rule: v=1 -> 0; v=2 -> ceil(ln2/ln1.25)=4
    val bins = SketchOps.ddHistogram(Seq(("x", 1L), ("x", 2L)).toDF("s", "v"), "s", "v")
      .collect().map(r => r.getAs[Long]("bin")).sorted
    assert(bins.toList == List(0L, 4L))
    // every estimated quantile within the α = (γ−1)/(γ+1) = 1/9 bound
    val qs = SketchOps.ddQuantiles(hist, Seq(500L, 950L, 990L)).collect()
    val byKey = vals.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    qs.foreach { r =>
      val g = r.getAs[String]("g"); val q = r.getAs[Long]("q_milli")
      val est = r.getAs[Long]("est_milli") / 1000.0
      val sortedVals = byKey(g)
      val trueQ = sortedVals(math.min(sortedVals.size - 1,
        math.ceil(q / 1000.0 * sortedVals.size).toInt - 1)).toDouble
      assert(math.abs(est - trueQ) / trueQ <= 1.0 / 9 + 0.02,
        s"$g q$q: est $est vs true $trueQ breaks the α bound")
    }
    // plain-addition mergeability: any 3-way batch split sums to the
    // one-shot histogram exactly
    val parts = (0 until 3).map(b => df.where(abs(hash(col("v"))) % 3 === b))
    val merged = parts.map(p => SketchOps.ddHistogram(p, "src", "v"))
      .reduce(_ union _).groupBy("g", "bin").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("bin")) ->
        r.getAs[Long]("cnt")).toMap
    val oneShot = hist.collect().map(r => (r.getAs[String]("g"),
      r.getAs[Long]("bin")) -> r.getAs[Long]("cnt")).toMap
    assert(merged == oneShot)
    // values below 1 are dropped from the log-binned support
    assert(SketchOps.ddHistogram(Seq(("z", 0L), ("z", -5L)).toDF("s", "v"),
      "s", "v").count() == 0L)
  }

  test("ksDriftFromHistogram: exact CDF-gap argmax; single group reads zero drift") {
    // a: mass at bin 1; b: mass at bin 2 — symmetric drift vs the pool
    val hist = Seq(("a", 1L, 3L), ("a", 2L, 1L), ("b", 1L, 1L), ("b", 2L, 3L))
      .toDF("g", "bin", "cnt")
    val out = SketchOps.ksDriftFromHistogram(hist).orderBy("g").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_g") == 4L && r.getAs[Long]("n_global") == 8L)
      assert(r.getAs[Long]("ks_bin") == 1L)  // the gap peaks after bin 1
      assert(r.getAs[Long]("ks_num") == 8L)  // |3·8 − 4·4| = |1·8 − 4·4| = 8
      assert(r.getAs[Long]("ks_micro") == 250000L) // 8 / 32
    }
    // one group IS the pool: every cum_g·n_global == cum_global·n_g
    val solo = SketchOps.ksDriftFromHistogram(
      Seq(("only", 1L, 5L), ("only", 3L, 2L)).toDF("g", "bin", "cnt")).collect()
    assert(solo.length == 1 && solo.head.getAs[Long]("ks_num") == 0L)
    // a group missing a global bin still pays the gap at that bin
    val miss = SketchOps.ksDriftFromHistogram(
      Seq(("x", 1L, 4L), ("y", 2L, 4L)).toDF("g", "bin", "cnt"))
      .orderBy("g").collect()
    assert(miss.forall(_.getAs[Long]("ks_num") == 16L)) // |4·8 − 4·4| at bin 1
  }

  test("mgSummary/mgAbsorb: frequent-elements guarantee and error accounting") {
    // Zipf-ish: key i repeated (40 - i) times for i in 0..39; n = 820
    val rows = (0 until 40).flatMap(i => Seq.fill(40 - i)(s"k$i")).toDF("tok")
    val k = 8
    val out = SketchOps.mgSummary(rows, "tok", k).collect()
    assert(out.nonEmpty && out.length <= k)
    val n = out.head.getAs[Long]("n_tot"); val dec = out.head.getAs[Long]("dec")
    assert(n == 820L && dec <= n / (k + 1), s"dec $dec exceeds n/(k+1)")
    val truth = (0 until 40).map(i => s"k$i" -> (40L - i)).toMap
    out.foreach { r =>
      val key = r.getAs[String]("key"); val lo = r.getAs[Long]("cnt_lo")
      assert(lo >= 1 && lo <= truth(key), s"$key lower bound $lo vs ${truth(key)}")
      assert(truth(key) - lo <= dec, s"$key error above dec")
    }
    // every key with true count > n/(k+1) MUST survive
    val mustKeep = truth.filter(_._2 > n / (k + 1)).keySet
    assert(mustKeep.subsetOf(out.map(_.getAs[String]("key")).toSet))
    // batched absorb keeps the guarantee and tightens nothing it shouldn't:
    // same rows split into 3 arbitrary batches
    val batches = (0 until 3).map(b => rows.where(abs(hash(col("tok"))) % 3 === b))
    val absorbed = batches.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      (st, b) => Some(SketchOps.mgAbsorb(st, b, "tok", k).localCheckpoint(true))
    }.get.collect()
    val an = absorbed.head.getAs[Long]("n_tot")
    val adec = absorbed.head.getAs[Long]("dec")
    assert(an == 820L && adec <= an / (k + 1),
      s"absorbed dec $adec breaks the mergeable bound")
    absorbed.foreach { r =>
      val key = r.getAs[String]("key"); val lo = r.getAs[Long]("cnt_lo")
      assert(lo <= truth(key) && truth(key) - lo <= adec)
    }
    assert(mustKeep.subsetOf(absorbed.map(_.getAs[String]("key")).toSet))
    // uniform input with > k distinct keys compresses to nothing (the
    // documented empty-summary caveat)
    val uni = (0 until 20).flatMap(i => Seq.fill(3)(s"u$i")).toDF("tok")
    assert(SketchOps.mgSummary(uni, "tok", k).count() == 0L)
  }

  test("mgMergeSummaries: shard-tree merge keeps bounds and k-row size") {
    val left = (0 until 30).flatMap(i => Seq.fill(30 - i)(s"k$i")).toDF("tok")
    val right = (0 until 30).flatMap(i => Seq.fill(if (i < 5) 50 else 2)(s"k$i")).toDF("tok")
    val k = 8
    val a = SketchOps.mgSummary(left, "tok", k).localCheckpoint(true)
    val b = SketchOps.mgSummary(right, "tok", k).localCheckpoint(true)
    val m = SketchOps.mgMergeSummaries(a, b, k).collect()
    assert(m.nonEmpty && m.length <= k)
    val n = m.head.getAs[Long]("n_tot"); val dec = m.head.getAs[Long]("dec")
    val trueN = (0 until 30).map(i => (30L - i) + (if (i < 5) 50L else 2L)).sum
    assert(n == trueN)
    val truth = (0 until 30).map(i => s"k$i" -> ((30L - i) + (if (i < 5) 50L else 2L))).toMap
    m.foreach { r =>
      val key = r.getAs[String]("key"); val lo = r.getAs[Long]("cnt_lo")
      assert(lo <= truth(key) && truth(key) - lo <= dec)
    }
    // k0..k4 (counts 80..76) dominate and must survive the merge
    assert((0 until 5).map(i => s"k$i").toSet
      .subsetOf(m.map(_.getAs[String]("key")).toSet))
  }
}
