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
}
