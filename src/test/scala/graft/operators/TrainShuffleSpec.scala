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
}
