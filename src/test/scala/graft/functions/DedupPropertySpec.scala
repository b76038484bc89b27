package graft.functions

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for [[DedupOps.containmentPairs]] against a brute-force
  * oracle: random shingle multisets must reproduce the oriented pair set
  * exactly — including the equal-size tie-break (`sz_a === sz_b` breaks
  * toward the lower id) and the guard's size-preservation invariant
  * (hot shingles dropped from the intersection still count toward |A|,
  * so the guard can only LOWER a score, never inflate it).
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  private val words = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
  private val N = 2 // bigram shingles

  /** Same semantics as word_ngram_hashes for ASCII single-space text:
    * distinct word n-grams. */
  private def shingleSet(ws: List[String]): Set[String] =
    ws.sliding(N).filter(_.length == N).map(_.mkString(" ")).toSet

  private case class Oracle(pairs: Map[(Long, Long), Double], sizes: Map[Long, Int])

  private def oracle(docs: List[List[String]], threshold: Double,
                     maxDocFreq: Long): Oracle = {
    val sets = docs.map(shingleSet).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val hot: Set[String] =
      if (maxDocFreq <= 0) Set.empty
      else sets.flatMap(_._2).groupBy(identity).collect {
        case (h, occ) if occ.size > maxDocFreq => h
      }.toSet
    val pairs = for {
      (ia, sa) <- sets
      (ib, sb) <- sets
      if ia != ib
      // orientation: id_a is the contained (smaller) side, ties → lower id
      if sa.size < sb.size || (sa.size == sb.size && ia < ib)
      if sa.nonEmpty
      c = ((sa intersect sb) diff hot).size
      if c > 0
      score = c.toDouble / sa.size // ORIGINAL size, pre-guard
      if score >= threshold
    } yield ((ia, ib), score)
    Oracle(pairs.toMap, sets.map { case (i, s) => (i, s.size) }.toMap)
  }

  test("containmentPairs matches brute-force oracle: orientation, tie-break, guard size preservation") {
    val gen = for {
      nDocs <- Gen.choose(2, 10)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 10).flatMap(Gen.listOfN(_, Gen.oneOf(words))))
      threshold <- Gen.oneOf(0.34, 0.5, 0.9)
      maxDocFreq <- Gen.oneOf(0L, 2L, 4L)
    } yield (docs, threshold, maxDocFreq)
    check(Prop.forAll(gen) { case (docs, threshold, maxDocFreq) =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
      val got = DedupOps.containmentPairs(df, "text", "doc_id",
          n = N, threshold = threshold, maxDocFreq = maxDocFreq)
        .collect()
        .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
          r.getAs[Double]("containment"))).toMap
      val exp = oracle(docs, threshold, maxDocFreq)
      val oriented = got.keys.forall { case (a, b) =>
        val (sa, sb) = (exp.sizes(a), exp.sizes(b))
        sa < sb || (sa == sb && a < b)
      }
      val samePairs = got.keySet == exp.pairs.keySet
      val sameScores = samePairs && got.forall { case (k, v) =>
        math.abs(v - exp.pairs(k)) < 1e-12
      }
      if (!(oriented && sameScores)) {
        println(s"docs=$docs t=$threshold mdf=$maxDocFreq\n got=$got\n exp=${exp.pairs}")
      }
      oriented && sameScores
    })
  }

  test("guard can only lower scores: guarded pair set is a subset with scores <= unguarded") {
    val gen = for {
      nDocs <- Gen.choose(3, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(2, 10).flatMap(Gen.listOfN(_, Gen.oneOf(words))))
    } yield docs
    check(Prop.forAll(gen) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
      def run(mdf: Long) = DedupOps.containmentPairs(df, "text", "doc_id",
          n = N, threshold = 0.0, maxDocFreq = mdf)
        .collect()
        .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
          r.getAs[Double]("containment"))).toMap
      val unguarded = run(0L)
      val guarded = run(2L)
      guarded.forall { case (k, v) => unguarded.get(k).exists(v <= _ + 1e-12) }
    })
  }
}
