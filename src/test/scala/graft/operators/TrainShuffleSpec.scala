package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 100L).map(i => (i, s"d$i")).toDF("id", "payload")

  test("shuffleShards emits a dense 1-based position per shard and covers every row") {
    val out = TrainShuffle.shuffleShards(docs, "id", nShards = 4).collect()
    assert(out.length == 100)
    val byShard = out.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.subsetOf((0L until 4L).toSet))
    byShard.foreach { case (sh, rows) =>
      val ps = rows.map(_.getAs[Long]("pos")).sorted
      assert(ps.toSeq == (1L to rows.length).toSeq, s"shard $sh positions not dense: $ps")
    }
  }

  test("shuffleShards actually permutes (shard order differs from id order)") {
    val out = TrainShuffle.shuffleShards(docs, "id", nShards = 1).collect()
      .sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("id")).toSeq
    assert(out.toSet == (0L until 100L).toSet)
    assert(out != (0L until 100L).toSeq, "LCG order should not equal id order")
  }

  test("shuffleShards is reproducible for a seed and differs across seeds") {
    def run(seed: Long, df: org.apache.spark.sql.DataFrame = docs) =
      TrainShuffle.shuffleShards(df, "id", nShards = 4, seed = seed).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toSet
    assert(run(7L) == run(7L, docs.repartition(9)))
    assert(run(7L) != run(8L))
  }

  test("curriculumInterleave: per-source order, rotation, and gap-free prefix") {
    import spark.implicits._
    // 3 sources of different sizes; ord = difficulty*2^8 + id (unique)
    val rows = Seq(
      (1L, "a", 30L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 5L), (5L, "b", 50L),
      (6L, "c", 7L))
      .map { case (id, src, diff) => (id, src, diff, diff * 256 + id) }
    val df = rows.toDF("id", "src", "diff", "ord")
    val out = TrainShuffle.curriculumInterleave(df, "src", "ord")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("src"),
        r.getAs[Long]("rank"), r.getAs[Long]("curriculum_idx"))).sortBy(_._4)
    // within each source, curriculum follows ascending ord (easy first)
    val bySrc = out.groupBy(_._2)
    assert(bySrc("a").sortBy(_._3).map(_._1).toSeq == Seq(2L, 3L, 1L))
    assert(bySrc("b").sortBy(_._3).map(_._1).toSeq == Seq(4L, 5L))
    // first G positions are one row per source (round-robin while all last)
    assert(out.take(3).map(_._2).toSet == Set("a", "b", "c"))
    // idx formula: (rank-1)*3 + src_idx with sources ordered a,b,c
    out.foreach { case (_, src, rank, idx) =>
      val srcIdx = Seq("a", "b", "c").indexOf(src)
      assert(idx == (rank - 1) * 3 + srcIdx)
    }
    // deterministic under repartition
    val again = TrainShuffle.curriculumInterleave(df.toDF().repartition(5), "src", "ord")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("curriculum_idx"))).toSet
    assert(again == out.map(r => (r._1, r._4)).toSet)
  }

  test("paddingWaste buckets to next pow2 with a floor and audits both wastes") {
    import spark.implicits._
    val df = Seq(3L, 16L, 17L, 30L, 100L).toDF("ntok")
    val out = TrainShuffle.paddingWaste(df, "ntok", minWidth = 16)
      .orderBy("bucket_w").collect()
      .map(r => (r.getAs[Long]("bucket_w"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_tok"), r.getAs[Long]("waste_bp"), r.getAs[Long]("naive_waste_bp")))
    // 3→16(floor), 16→16, 17→32, 30→32, 100→128
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((16L, 2L, 19L), (32L, 2L, 47L), (128L, 1L, 100L)))
    val naive = (5L * 128 - 166) * 10000 / (5L * 128)
    assert(out.forall(_._5 == naive))
    assert(out.head._4 == (2L * 16 - 19) * 10000 / (2L * 16))
    // bucketing strictly beats pad-to-max on this skewed set
    val bucketed = out.map(t => t._2 * t._1 - t._3).sum
    assert(bucketed < 5L * 128 - 166)
  }

  test("rendezvousShard: in-range, roughly uniform, and minimal disruption on resize") {
    val keys = (0L until 400L).toDF("id")
    val out = keys.select(col("id"),
        TrainShuffle.rendezvousShard(col("id"), 8).as("s8"),
        TrainShuffle.rendezvousShard(col("id"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall { case (_, s8, s9) => s8 >= 0 && s8 < 8 && s9 >= 0 && s9 < 9 })
    // every shard populated, no shard hoards (uniformity sanity, 400 keys / 8)
    val by8 = out.groupBy(_._2).view.mapValues(_.size)
    assert(by8.size == 8 && by8.values.forall(n => n > 20 && n < 90))
    // THE HRW property: growing 8 -> 9 moves keys ONLY to the new shard
    val moved = out.filter { case (_, s8, s9) => s8 != s9 }
    assert(moved.nonEmpty && moved.forall(_._3 == 8L))
    // and the moved fraction is ~1/9, not ~8/9 (mod-n would reshuffle all)
    assert(moved.size < 400 / 4)
  }
}
