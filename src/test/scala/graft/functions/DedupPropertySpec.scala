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

  test("duplicateSpans: shared run marked in both docs, merged to one maximal span") {
    // docs 0 and 1 share a 12-token run at different offsets; doc 2 is unique
    val run = (1 to 12).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      0L -> s"a b c $run",
      1L -> s"$run x y z",
      2L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
    val got = DedupOps.duplicateSpans(docs.toDF("doc_id", "text"), "text", "doc_id",
        windowTokens = 8, minOccurrences = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("n_windows"))).sorted
    // 12-token run → 5 windows of 8, one merged span each
    assert(got.toSeq == Seq((0L, 3L, 14L, 5L), (1L, 0L, 11L, 5L)))
  }

  test("duplicateSpans: within-doc repeat is a duplicate; far-apart spans stay split") {
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    val gap = (1 to 12).map(i => s"g$i").mkString(" ") // > W tokens between runs
    val docs = Seq(0L -> s"$run $gap $run")
    val got = DedupOps.duplicateSpans(docs.toDF("doc_id", "text"), "text", "doc_id",
        windowTokens = 8, minOccurrences = 2)
      .collect().map(r => (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).sorted
    assert(got.toSeq == Seq((0L, 7L), (20L, 27L)))
  }

  test("duplicateSpans property: matches brute-force windows/islands oracle") {
    val W = 3
    val gen = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 14).flatMap(Gen.listOfN(_, Gen.oneOf(words))))
    } yield docs
    check(Prop.forAll(gen) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = DedupOps.duplicateSpans(df, "text", "doc_id", windowTokens = W, minOccurrences = 2)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
          r.getAs[Long]("span_end"), r.getAs[Long]("n_windows"))).toSet
      // oracle: count windows globally, flag, merge islands with gap <= W
      val wins = docs.zipWithIndex.flatMap { case (ws, id) =>
        ws.sliding(W).zipWithIndex.collect {
          case (w, p) if w.length == W => (id.toLong, p, w.mkString(" "))
        }
      }
      val dupContent = wins.groupBy(_._3).collect { case (c, o) if o.size >= 2 => c }.toSet
      val exp = wins.filter(w => dupContent(w._3)).groupBy(_._1).flatMap { case (id, fs) =>
        val ps = fs.map(_._2).sorted
        val islands = ps.foldLeft(List.empty[List[Int]]) {
          case (Nil, p) => List(List(p))
          case (cur :: done, p) if p - cur.head <= W => (p :: cur) :: done
          case (acc, p) => List(p) :: acc
        }
        islands.map(is => (id, is.min.toLong, is.max.toLong + W - 1, is.size.toLong))
      }.toSet
      if (got != exp) println(s"docs=$docs\n got=$got\n exp=$exp")
      got == exp
    })
  }

  test("removeDuplicateSpans: keep-first — the earlier doc survives intact, the later is cut") {
    def md5Of(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val run = (1 to 10).map(i => s"d$i").mkString(" ")
    val docs = Seq(0L -> s"$run tail1 tail2", 1L -> s"head1 head2 $run",
      2L -> "u1 u2 u3 u4 u5 u6 u7 u8")
    val got = DedupOps.removeDuplicateSpans(docs.toDF("doc_id", "text"), "text", "doc_id",
        windowTokens = 8, minOccurrences = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[String]("kept_fp"))).sortBy(_._1)
    // doc 0 holds every canonical occurrence → untouched; doc 1 loses the
    // 10-token run but keeps its unique head; doc 2 has no duplicates
    assert(got(0) == (0L, 12L, 0L, md5Of(s"$run tail1 tail2")))
    assert(got(1) == (1L, 12L, 10L, md5Of("head1 head2")))
    assert(got(2) == (2L, 8L, 0L, md5Of("u1 u2 u3 u4 u5 u6 u7 u8")))
  }

  test("removeDuplicateSpans: a doc duplicated wholesale is removed entirely, one copy survives") {
    val text = (1 to 9).map(i => s"w$i").mkString(" ")
    val docs = Seq(5L -> text, 9L -> text)
    val got = DedupOps.removeDuplicateSpans(docs.toDF("doc_id", "text"), "text", "doc_id",
        windowTokens = 8, minOccurrences = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_removed"))).sortBy(_._1)
    assert(got.toSeq == Seq((5L, 0L), (9L, 9L))) // min doc_id is canonical
  }

  test("removeDuplicateSpans: chained overlaps cannot destroy every copy (canonical cover protected)") {
    // X = t1..t8 canonical in doc 5; Y = t2..t9 canonical in doc 1.
    // doc 5's Y occurrence is redundant and overlaps X's canonical one —
    // naive removal would cut t2..t9 out of doc 5 AND t1..t8 out of
    // doc 9, leaving no intact copy of X anywhere.
    val t = (1 to 9).map(i => s"t$i")
    val docs = Seq(
      1L -> t.drop(1).mkString(" "), // t2..t9
      5L -> t.mkString(" "),         // t1..t9
      9L -> t.take(8).mkString(" ")) // t1..t8
    val got = DedupOps.removeDuplicateSpans(docs.toDF("doc_id", "text"), "text", "doc_id",
        windowTokens = 8, minOccurrences = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"))).toMap
    assert(got(1L) == (8L, 0L)) // Y's canonical home, untouched
    assert(got(5L) == (9L, 1L)) // X protected (t1..t8 kept); only t9 cut
    assert(got(9L) == (8L, 8L)) // X redundant here, canonical copy lives in doc 5
  }

  test("detection/removal consistency: removed tokens never exceed detected span coverage") {
    val W = 3
    val gen = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 14).flatMap(Gen.listOfN(_, Gen.oneOf(words))))
    } yield docs
    check(Prop.forAll(gen) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val spans = DedupOps.duplicateSpans(df, "text", "doc_id", W, 2)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("span_end") - r.getAs[Long]("span_start") + 1))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val removed = DedupOps.removeDuplicateSpans(df, "text", "doc_id", W, 2)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_removed"))).toMap
      // every removed token lies inside some detected span; canonical
      // protection can only shrink removal below the detected cover
      removed.forall { case (id, n) => n <= spans.getOrElse(id, 0L) }
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
