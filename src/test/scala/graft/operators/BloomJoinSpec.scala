package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomPrunedJoin result is identical to the plain join") {
    val rng = new scala.util.Random(43)
    val fact = (1L to 500L).map(i => (rng.nextInt(100).toLong, i)).toDF("fk", "payload")
    val dim = (0 until 20).map(_ => (rng.nextInt(100).toLong, "d")).distinct.toDF("dk", "tag")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("fk", "payload", "dk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pruned = rows(BloomJoin.bloomPrunedJoin(fact, "fk", dim, "dk"))
    val plain = rows(fact.join(dim, fact("fk") === dim("dk")))
    assert(pruned == plain)
  }

  test("bloomPrunedJoin with an empty dimension yields no rows (and no NPE)") {
    val fact = Seq((1L, "x"), (2L, "y")).toDF("fk", "p")
    val dim = Seq.empty[(Long, String)].toDF("dk", "t")
    assert(BloomJoin.bloomPrunedJoin(fact, "fk", dim, "dk").count() == 0)
  }

  test("bloomPrunedJoin keeps duplicate matches (it is a join, not a semi-join)") {
    val fact = Seq((5L, 1L), (5L, 2L)).toDF("fk", "p")
    val dim = Seq((5L, "a"), (5L, "b")).toDF("dk", "t")
    assert(BloomJoin.bloomPrunedJoin(fact, "fk", dim, "dk").count() == 4)
  }
}
