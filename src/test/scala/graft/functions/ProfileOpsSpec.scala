package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileOpsSpec extends SparkSpec {

  test("robustZ: hand-computed median/MAD, outlier immune to its own magnitude, MAD=0 clamp") {
    import spark.implicits._
    // g1: values 1..7 plus outlier 1000 -> median = 4 (type-1, k = ceil(8/2) = 4),
    // deviations sorted 0,1,1,2,2,3,3,996 -> MAD = 2 (4th)
    val g1 = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 1000L).zipWithIndex
      .map { case (v, i) => (i.toLong, "g1", v) }
    // g2: all identical -> MAD 0 clamps to 1, every z = 0
    val g2 = Seq(10L, 10L, 10L).zipWithIndex
      .map { case (v, i) => ((100 + i).toLong, "g2", v) }
    val df = (g1 ++ g2).toDF("id", "g", "v")
    val got = ProfileOps.robustZ(df, "g", "v", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("median"), r.getAs[Long]("mad"), r.getAs[Long]("z_milli")))).toMap
    assert(got(0L) == ((4L, 2L, -1500L)))  // (1-4)*1000/2
    assert(got(7L) == ((4L, 2L, 498000L))) // the outlier scores, not hides
    assert(got(100L) == ((10L, 0L, 0L)))   // MAD=0 -> clamp, z=0
  }

  test("bootstrapCI: exact replay of Poisson draws matches an independent re-derivation") {
    import spark.implicits._
    val rows = (1L to 30L).map(i => (i, "g", (i * 3 % 17)))
    val df = rows.toDF("id", "g", "x")
    val got = ProfileOps.bootstrapCI(df, "g", "x", "id", reps = 50)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("mean_micro"), r.getAs[Long]("ci_lo_micro"),
        r.getAs[Long]("ci_hi_micro"))).toList
    // independent re-derivation of every draw
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x")
        .mkString.take(15), 16)
    val thresholds = Seq(424136118829305344L, 848272237658610688L,
      1060340297073263360L, 1131029650211480960L, 1148701988496035328L,
      1152236456152946176L, 1152825534095764608L)
    def weight(id: Long, r: Int): Long = {
      val u = hash60(s"boot:$id:$r")
      thresholds.indexWhere(u < _) match { case -1 => 7L; case k => k.toLong }
    }
    val means = (0 until 50).flatMap { r =>
      val (sx, sw) = rows.foldLeft((0L, 0L)) { case ((ax, aw), (id, _, x)) =>
        val w = weight(id, r); (ax + w * x, aw + w)
      }
      if (sw > 0) Some((sx.toDouble / sw.toDouble, r)) else None
    }.sorted
    val b = means.size
    def pick(pm: Int) = means(math.max(1, math.ceil(b * pm / 1000.0).toInt) - 1)._1
    val mean = rows.map(_._3.toLong).sum.toDouble / rows.size
    assert(got == List(("g", 30L, math.floor(mean * 1e6).toLong,
      math.floor(pick(25) * 1e6).toLong, math.floor(pick(975) * 1e6).toLong)))
    // interval is ordered and brackets the point estimate on this fixture
    val (_, _, m, lo, hi) = got.head
    assert(lo <= m && m <= hi)
  }
  import spark.implicits._

  private def events = (1 to 10000).map(i =>
    (s"type${i % 3}", (i % 997).toLong, i.toDouble)).toDF("etype", "user", "value")

  test("approx distinct is within the configured relative error of exact") {
    val exact = ProfileOps.distinctProfile(events, "etype", "user")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ProfileOps.approxDistinctProfile(events, "etype", "user", rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex < 0.15, s"$k: $ex vs ${approx(k)}")
    }
  }

  test("approx percentiles bracket the exact ones") {
    val approx = ProfileOps.approxPercentiles(events, "etype", "value", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = events.groupBy("etype")
      .agg(expr("percentile(value, array(0.5, 0.9))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    exact.foreach { case (k, ex) =>
      ex.zip(approx(k)).foreach { case (e, a) =>
        assert(math.abs(a - e) / math.max(e, 1.0) < 0.05, s"$k: $e vs $a")
      }
    }
  }

  test("groupOverlap counts shared shingles and scales to overlap coefficient") {
    import spark.implicits._
    // a and b share the 3-gram "x y z"; c shares nothing
    val docs = Seq(
      ("a", "x y z p q r"),   // shingles: "x y z","y z p","z p q","p q r"
      ("b", "x y z different tail here"),
      ("c", "completely other words entirely")).toDF("src", "text")
    val out = ProfileOps.groupOverlap(docs, "text", "src", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("shared"), r.getAs[Long]("overlap_bp"))).toMap
    assert(out.keySet == Set(("a", "b")))   // c overlaps nobody
    val (shared, bp) = out(("a", "b"))
    assert(shared == 1L)
    assert(bp == 10000L / 4L)               // 1 shared / min(4, 4) shingles
  }

  test("groupOverlap hot-shingle guard drops ubiquitous shingles before the join") {
    import spark.implicits._
    // "the same line" appears in ALL four sources; only a/b share "unique
    // pair shingle". guard at 3 < 4 sources → the ubiquitous shingle is
    // dropped and contributes no pairs (and no size mass)
    val docs = Seq(
      ("a", "the same line unique pair shingle"),
      ("b", "the same line unique pair shingle"),
      ("c", "the same line plus c stuff"),
      ("d", "the same line and then d")).toDF("src", "text")
    val guarded = ProfileOps.groupOverlap(docs, "text", "src", n = 3, maxGroupFreq = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("shared")).toMap
    val unguarded = ProfileOps.groupOverlap(docs, "text", "src", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("shared")).toMap
    assert(unguarded.keySet == Set(("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),("c","d")))
    // with the guard, pairs held together ONLY by "the same line" vanish
    assert(guarded.keySet == Set(("a", "b")))
    assert(guarded(("a", "b")) == 3L && unguarded(("a", "b")) == 4L)
  }
}

class ExactQuantilesSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.functions.ProfileOps

  private def check(values: Seq[Long], qs: Seq[Double], width: Long): Unit = {
    val out = ProfileOps.exactQuantiles(values.toDF("v"), "v", qs, width)
      .collect().map(r => r.getAs[Int]("q_bp") -> r.getAs[Long]("value")).toMap
    val sorted = values.sorted
    qs.foreach { q =>
      val k = math.ceil(q * values.size).toLong.max(1)
      val expect = sorted((k - 1).toInt)
      assert(out(math.round(q * 10000).toInt) == expect,
        s"q=$q: got ${out(math.round(q * 10000).toInt)}, want $expect (k=$k)")
    }
  }

  test("exactQuantiles matches the sorted reference, ties and all") {
    val rng = new scala.util.Random(23)
    val vals = Seq.fill(5000)(rng.nextInt(200).toLong) // heavy ties
    check(vals, Seq(0.5, 0.9, 0.99, 1.0), width = 16)
  }

  test("exactQuantiles handles negatives and the toward-zero bucket 0 span") {
    val rng = new scala.util.Random(29)
    val vals = Seq.fill(3000)((rng.nextInt(4001) - 2000).toLong)
    check(vals, Seq(0.01, 0.25, 0.5, 0.75), width = 64)
  }

  test("exactQuantiles is exact when everything lands in one bucket") {
    check(Seq(5L, 1L, 9L, 3L, 7L), Seq(0.2, 0.6, 1.0), width = 1L << 16)
  }

  test("skewProfile ranks heavy keys and computes integer salt factors") {
    import spark.implicits._
    // hot: 70 rows, warm: 25, cold: 5 → total 100, n_keys 3
    val df = (Seq.fill(70)("hot") ++ Seq.fill(25)("warm") ++ Seq.fill(5)("cold"))
      .toDF("k")
    val out = ProfileOps.skewProfile(df, "k", topN = 2, targetRows = 20L)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("key"), r.getAs[Long]("cnt"),
        r.getAs[Long]("share_bp"), r.getAs[Long]("pct_of_mean_x100"), r.getAs[Long]("salt")))
    assert(out.toSeq == Seq(
      (1, "hot", 70L, 7000L, 210L * 100 / 100, 4L), // 70/20 → ceil = 4
      (2, "warm", 25L, 2500L, 75L, 2L)))
  }

  test("skewProfile breaks count ties deterministically by key") {
    import spark.implicits._
    val df = (Seq.fill(3)("b") ++ Seq.fill(3)("a") ++ Seq.fill(1)("z")).toDF("k")
    val out = ProfileOps.skewProfile(df, "k", topN = 3, targetRows = 100L)
      .orderBy("rank").collect().map(_.getAs[String]("key"))
    assert(out.toSeq == Seq("a", "b", "z"))
  }

  test("exactQuantilesGrouped matches per-group sorted-rank ground truth") {
    import spark.implicits._
    val rng = new scala.util.Random(37)
    val rows = (0 until 2000).map(i => (s"g${i % 3}", rng.nextInt(500).toLong))
    val qs = Seq(0.25, 0.5, 0.9, 1.0)
    val out = ProfileOps.exactQuantilesGrouped(rows.toDF("g", "v"), "g", "v", qs,
      bucketWidth = 16L)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Int]("q_bp"),
        r.getAs[Long]("value"))).toSet
    val expected = rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      qs.map { q =>
        val k = math.ceil(q * sorted.size).toLong
        (g, math.round(q * 10000).toInt, sorted((k - 1).toInt))
      }
    }.toSet
    assert(out == expected)
  }

  test("psiDrift: identical slices yield zero contributions") {
    import spark.implicits._
    val a = Seq(5L, 15L, 25L, 25L, 45L).toDF("v")
    val out = ProfileOps.psiDrift(a, a, "v", bucketWidth = 10L)
      .collect().map(_.getAs[Long]("contrib_micro"))
    assert(out.forall(_ == 0L))
  }

  test("psiDrift matches a driver-side reference with Laplace smoothing") {
    import spark.implicits._
    val oldV = Seq(1L, 2L, 11L, 12L, 13L, 25L)
    val newV = Seq(3L, 14L, 15L, 16L, 27L, 28L, 35L)
    val out = ProfileOps.psiDrift(oldV.toDF("v"), newV.toDF("v"), "v", 10L)
      .orderBy("b").collect()
      .map(r => (r.getAs[Long]("b"), r.getAs[Long]("cnt_old"),
        r.getAs[Long]("cnt_new"), r.getAs[Long]("contrib_micro")))
    val buckets = (oldV ++ newV).map(_ / 10).distinct.sorted
    val co = oldV.groupBy(_ / 10).view.mapValues(_.size.toLong).toMap
    val cn = newV.groupBy(_ / 10).view.mapValues(_.size.toLong).toMap
    val (tO, tN, nb) = (oldV.size.toLong, newV.size.toLong, buckets.size.toLong)
    val expected = buckets.map { b =>
      val pO = (co.getOrElse(b, 0L) + 1).toDouble / (tO + nb)
      val pN = (cn.getOrElse(b, 0L) + 1).toDouble / (tN + nb)
      (b, co.getOrElse(b, 0L), cn.getOrElse(b, 0L),
        math.round((pN - pO) * math.log(pN / pO) * 1e6))
    }
    assert(out.toSeq == expected)
    // drifted distribution: positive total PSI
    assert(out.map(_._4).sum > 0)
  }

  test("corrMatrix: perfect, inverse, and independent pairs") {
    import spark.implicits._
    // b = 2a (corr 1), c = -a + 10 (corr -1), d alternates independent of a
    val d = (1L to 40L).map(i => (i, 2 * i, 10 - i, if (i % 2 == 0) 1L else 0L))
      .toDF("a", "b", "c", "d")
    val m = ProfileOps.corrMatrix(d, Seq("a", "b", "c", "d"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("a", "b")) == 1000000L)
    assert(m(("a", "c")) == -1000000L)
    assert(math.abs(m(("a", "d"))) < 100000L) // alternating parity ~ uncorrelated
    assert(m.size == 6)
  }

  test("tokenEntropy: uniform beats collapsed; values match the closed form") {
    import spark.implicits._
    val d = Seq(
      (1L, "u", "a b c d"),            // uniform over 4 -> ln 4
      (2L, "k", "x x x x x x x y")) // collapsed -> low entropy
      .toDF("doc_id", "source", "text")
    val out = ProfileOps.tokenEntropy(d, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def ref(counts: Seq[Long]): Long = {
      val n = counts.sum
      -counts.map(c => c * math.round(1000 * math.log(c.toDouble / n))).sum / n
    }
    assert(out("u") == ((4L, 4L, ref(Seq(1, 1, 1, 1)))))
    assert(out("k") == ((8L, 2L, ref(Seq(7, 1)))))
    assert(out("u")._3 > out("k")._3)
  }

  test("percentileRank: deterministic (value, id) total order, exact permille, singleton group = 0") {
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 5L), ("a", 4L, 20L), ("a", 5L, 10L),
      ("b", 9L, 7L)).toDF("g", "id", "v")
    val out = ProfileOps.percentileRank(df, "g", "v", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("permille"))).toMap
    // group a order: (5,3) (10,1) (10,2) (10,5) (20,4) — ties broken by id
    assert(out(3L) == ((1L, 0L)))
    assert(out(1L) == ((2L, 250L)))
    assert(out(2L) == ((3L, 500L)))
    assert(out(5L) == ((4L, 750L)))
    assert(out(4L) == ((5L, 1000L)))
    assert(out(9L) == ((1L, 0L))) // singleton group: permille pinned to 0
    // partition-layout independence (the PrefixSum rank is total)
    val shuffled = ProfileOps.percentileRank(df.repartition(7), "g", "v", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("permille"))).toMap
    assert(shuffled == out)
  }
}
