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

  test("bloom probe filter sits BELOW the fact-side exchange (plan shape)") {
    // The operator's whole point: fact rows failing the key set never
    // reach the shuffle. Force the shuffle-join regime (no broadcast, no
    // AQE re-plan) and assert a ShuffleExchange whose SUBTREE contains
    // the UDF probe filter — a regression that lifts the filter above
    // the exchange (or loses it) fails here even though results stay
    // identical.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // range-backed inputs: a Seq-backed LocalRelation would let the
      // ConvertToLocalRelation rule evaluate the probe filter at
      // optimization time and erase the very shape under test
      val fact = spark.range(200)
        .select((col("id") % 50).as("fk"), col("id").as("payload"))
      val dim = spark.range(10).select(col("id").as("dk"), lit("d").as("tag"))
      val plan = BloomJoin.bloomPrunedJoin(fact, "fk", dim, "dk")
        .queryExecution.executedPlan
      val guarded = plan.collect {
        case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if ex.child.collect {
              case f: org.apache.spark.sql.execution.FilterExec
                  if f.condition.toString.contains("UDF") => f
            }.nonEmpty => ex
      }
      assert(guarded.nonEmpty,
        s"no shuffle exchange with the bloom probe filter below it in:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }
}
