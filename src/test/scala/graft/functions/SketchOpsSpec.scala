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
}
