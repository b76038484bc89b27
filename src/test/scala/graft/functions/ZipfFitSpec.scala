package graft.functions

import graft.SparkSpec

class ZipfFitSpec extends SparkSpec {
  import spark.implicits._

  test("an exact 1/rank frequency spectrum fits slope -1 with r2 = 1") {
    // counts 6, 3, 2 over ranks 1, 2, 3: ln(cnt) = ln 6 - ln(rank) exactly
    val docs = Seq((1L, ("a " * 6 + "b " * 3 + "c " * 2).trim))
      .toDF("doc_id", "text")
    val r = VocabOps.zipfFit(docs, "doc_id", "text", topN = 50)
      .as[(Long, Long, Long, Long, Long)].collect.head
    assert(r == ((3L, 11L, -1000L, math.round(math.log(6) * 1000), 1000L)))
  }

  test("topN caps the fit window; count ties rank deterministically by word") {
    val docs = Seq(
      (1L, "x x x x y y z z w"),
      (2L, "x y")).toDF("doc_id", "text")
    // counts: x=5, y=3, z=2, w=1 — topN=2 keeps x, y only
    val r = VocabOps.zipfFit(docs, "doc_id", "text", topN = 2)
      .as[(Long, Long, Long, Long, Long)].collect.head
    assert(r._1 == 2L && r._2 == 8L)
    // two points: slope = (ln3 - ln5) / (ln2 - ln1), r2 exact 1
    val slope = (math.log(3) - math.log(5)) / math.log(2)
    assert(r._3 == math.round(slope * 1000) && r._5 == 1000L)
  }
}
