package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin is row-identical to the plain equi-join") {
    // one pathological key (90% of rows) + a long tail
    val left = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i.toLong))
      .toDF("key", "v")
    val right = Seq(("hot", "H"), ("k950", "A"), ("k990", "B"), ("missing", "Z"))
      .toDF("key", "tag")

    val plain = left.join(right, Seq("key"), "inner")
      .select("key", "v", "tag").collect().toSet
    val salted = SkewJoin.saltedEquiJoin(left, right, "key", salts = 8)
      .select("key", "v", "tag").collect().toSet
    assert(salted == plain)
    assert(plain.count(_.getString(0) == "hot") == 900)

    val plainLeft = left.join(right, Seq("key"), "left")
      .select("key", "v", "tag").collect().toSet
    val saltedLeft = SkewJoin.saltedEquiJoin(left, right, "key", salts = 8, joinType = "left")
      .select("key", "v", "tag").collect().toSet
    assert(saltedLeft == plainLeft)
  }

  test("salt spreads the hot key across buckets even for FULLY DUPLICATE rows") {
    // identical rows — a content-hash salt would put all 1000 in one bucket
    val left = (1 to 1000).map(_ => ("hot", 42L)).toDF("key", "v")
    val buckets = left
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(buckets.length == 8)
    assert(buckets.max < 1000 * 0.5) // no single bucket holds the key
  }

  test("unsupported join types are rejected") {
    val df = Seq(("a", 1L)).toDF("key", "v")
    assertThrows[IllegalArgumentException](
      SkewJoin.saltedEquiJoin(df, df, "key", joinType = "full_outer"))
  }
}
