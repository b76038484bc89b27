package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContaminationFractionSpec extends SparkSpec {
  import spark.implicits._

  test("contaminationFraction normalizes hits and keeps clean/short docs at 0.0") {
    val probeDoc = (0L, "a b c d e f")
    val docs = Seq(
      probeDoc,
      (1L, "a b c d e f"),      // identical: every 3-gram in probe set
      (2L, "a b c x y z"),      // shares exactly the "a b c" 3-gram: 1 of 4
      (3L, "p q r s t u"),      // clean
      (4L, "hi there")          // < 3 tokens: no 3-grams
    ).toDF("doc_id", "text")
    val probes = docs.where($"doc_id" === 0L)
      .select(explode(DedupOps.shingles($"text", 3)).as("probe"))
    val out = TextFunctions.contaminationFraction(
      docs.where($"doc_id" > 0L), "text", "doc_id", probes, "probe", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_ngrams"), r.getAs[Long]("n_hit"), r.getAs[Double]("contamination"))))
      .toMap
    assert(out(1L) == ((4, 4L, 1.0)))
    assert(out(2L) == ((4, 1L, 0.25)))
    assert(out(3L) == ((4, 0L, 0.0)))
    assert(out(4L) == ((0, 0L, 0.0))) // present, not dropped by the explode
  }

  test("contaminationFraction hit counts agree with contaminationHits") {
    val docs = (0L until 40L).map { i =>
      (i, s"alpha w$i bravo x${i % 7} charlie delta t${i % 5} echo foxtrot")
    }.toDF("doc_id", "text")
    val probes = docs.where($"doc_id" < 4)
      .select(explode(DedupOps.shingles($"text", 3)).as("probe"))
    val corpus = docs.where($"doc_id" >= 4)
    val hits = TextFunctions.contaminationHits(corpus, "text", "doc_id", probes, "probe", 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    val frac = TextFunctions.contaminationFraction(corpus, "text", "doc_id", probes, "probe", 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit")).toMap
    assert(frac.count(_._2 > 0) == hits.size)
    hits.foreach { case (id, n) => assert(frac(id) == n, s"doc $id") }
    assert(frac.size == 36) // every corpus doc present
  }
}

class AdaptiveKeepSpec extends SparkSpec {
  import spark.implicits._

  test("adaptiveKeepByScore learns a per-group threshold meeting the target") {
    // group A: one doc per decile bucket; keepFrac 0.3 of 10 = 3 docs,
    // so the threshold must land at bucket 7 (keeps .75/.85/.95)
    val a = (0 until 10).map(i => ("A", s"a$i", i / 10.0 + 0.05))
    // group B: all mass in one bucket — the whole bucket is the boundary
    val b = (0 until 4).map(i => ("B", s"b$i", 0.55))
    val df = (a ++ b).toDF("src", "id", "score")
    val kept = TextFunctions.adaptiveKeepByScore(df, "src", col("score"), keepFrac = 0.3, buckets = 10)
    val byGroup = kept.collect().groupBy(_.getAs[String]("src"))
    val aKept = byGroup("A").map(_.getAs[String]("id")).toSet
    assert(aKept == Set("a7", "a8", "a9"))
    assert(byGroup("A").forall(_.getAs[Int]("threshold_bucket") == 7))
    assert(byGroup("B").length == 4) // boundary bucket kept whole
    assert(byGroup("B").forall(_.getAs[Int]("threshold_bucket") == 5))
  }

  test("adaptiveKeepByScore keepFrac=1.0 keeps every row; bad args rejected") {
    val df = Seq(("A", 1L, 0.1), ("A", 2L, 0.9), ("B", 3L, 0.4)).toDF("src", "id", "score")
    assert(TextFunctions.adaptiveKeepByScore(df, "src", col("score"), 1.0, 10).count() == 3)
    intercept[IllegalArgumentException] {
      TextFunctions.adaptiveKeepByScore(df, "src", col("score"), 0.0, 10)
    }
    intercept[IllegalArgumentException] {
      TextFunctions.adaptiveKeepByScore(df, "src", col("score"), 0.5, 0)
    }
  }

  test("adaptiveKeepByScore score=1.0 clamps into the top bucket") {
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 0.0)).toDF("src", "id", "score")
    val kept = TextFunctions.adaptiveKeepByScore(df, "src", col("score"), 0.5, 20)
    val rows = kept.collect()
    assert(rows.map(_.getAs[Long]("id")).toSet == Set(1L))
    assert(rows.head.getAs[Int]("score_bucket") == 19)
  }
}
