package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileOpsSpec extends SparkSpec {
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
