package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: (id, key, time); right: (key, rtime, rid, rv)
  private def left = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 50L), (4L, 20L, 100L))
    .toDF("id", "key", "time")
  private def right = Seq((10L, 80L, 7L, 0.5), (10L, 150L, 8L, 0.7), (30L, 10L, 9L, 0.9))
    .toDF("key", "rtime", "rid", "rv")

  private def run() = AsOfJoin.asOf(left, right, "key", "key", "time", "rtime",
    Seq("rid", "rv"), "rid")
    .collect().map(r => r.getAs[Long]("id") ->
      (Option(r.getAs[Any]("rid")), Option(r.getAs[Any]("rv")))).toMap

  test("attaches the most recent right row with rtime <= time") {
    val m = run()
    assert(m(1L) == (Some(7L), Some(0.5)))  // time 100 → right at 80
    assert(m(2L) == (Some(8L), Some(0.7)))  // time 200 → right at 150
  }

  test("no prior right row → nulls") {
    val m = run()
    assert(m(3L) == (None, None))  // time 50 precedes all right rows
    assert(m(4L) == (None, None))  // key 20 has no right rows at all
  }

  test("right row exactly at left time is visible (<= semantics)") {
    val l = Seq((1L, 10L, 80L)).toDF("id", "key", "time")
    val m = AsOfJoin.asOf(l, right, "key", "key", "time", "rtime", Seq("rid"), "rid")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rid")).toMap
    assert(m(1L) == 7L)
  }

  test("ties on rtime resolve to greatest tie-break") {
    val r = Seq((10L, 80L, 7L), (10L, 80L, 11L)).toDF("key", "rtime", "rid")
    val l = Seq((1L, 10L, 90L)).toDF("id", "key", "time")
    val m = AsOfJoin.asOf(l, r, "key", "key", "time", "rtime", Seq("rid"), "rid")
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("rid")).toMap
    assert(m(1L) == 11L)
  }

  test("null value columns come from the matched right row, never an older one") {
    // most recent right row (rtime 150) has rv = null; a naive per-column
    // ignoreNulls fill would take rv = 0.5 from the OLDER row at 80
    val r = Seq((10L, 80L, 7L, Option(0.5)), (10L, 150L, 8L, Option.empty[Double]))
      .toDF("key", "rtime", "rid", "rv")
    val l = Seq((1L, 10L, 200L)).toDF("id", "key", "time")
    val m = AsOfJoin.asOf(l, r, "key", "key", "time", "rtime", Seq("rid", "rv"), "rid")
      .collect().map(x => x.getAs[Long]("id") ->
        (Option(x.getAs[Any]("rid")), Option(x.getAs[Any]("rv")))).toMap
    assert(m(1L) == (Some(8L), None))
  }
}
