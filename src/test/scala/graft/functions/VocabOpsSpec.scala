package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabOpsSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish corpus: w0 ×64, w1 ×32, ... w6 ×1, plus a 40-word singleton
  // tail — the boundary class lands inside the tail
  private def corpus = {
    val heads = (0 until 7).flatMap(i => Seq.fill(64 >> i)(s"w$i"))
    val tail = (0 until 40).map(i => s"t$i")
    (heads ++ tail).toDF("word")
  }

  test("coverageVocab covers at least the target and stops at the minimal class prefix") {
    val out = VocabOps.coverageVocab(corpus, "word", coverageBp = 8000)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val total = out.map(_._2).sum
    val target = (total * 8000 + 9999) / 10000
    val selMass = out.filter(_._3).map(_._2).sum
    assert(selMass >= target, s"selected mass $selMass < target $target")
    // minimality: dropping any selected SINGLETON word must break coverage
    // only if selection is exactly at the greedy boundary
    val selSingletons = out.count { case (_, c, s) => s && c == 1L }
    assert(selMass - target < 1 + 1, // greedy overshoot is < one boundary-class word
      s"overshoot ${selMass - target} too large for singleton boundary")
    assert(selSingletons > 0 && selSingletons < 40, "boundary must cut inside the tail")
  }

  test("coverageVocab at 100% selects everything, at 0% selects nothing") {
    val all = VocabOps.coverageVocab(corpus, "word", 10000).collect()
    assert(all.forall(_.getBoolean(2)))
    val none = VocabOps.coverageVocab(corpus, "word", 0).collect()
    assert(none.forall(!_.getBoolean(2)))
  }

  test("coverageVocab is deterministic under repartition (hash-order tail cut)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      VocabOps.coverageVocab(df, "word", 8000)
        .collect().map(r => (r.getString(0), r.getBoolean(2))).toSet
    assert(run(corpus) == run(corpus.repartition(11)))
  }

  test("empty corpus / empty vocab degenerate cleanly") {
    val noTokens = Seq.empty[String].toDF("word")
    assert(VocabOps.coverageVocab(noTokens, "word", 9500).count() == 0)
    val docs = Seq((1L, "hello world again")).toDF("doc_id", "text")
    // empty vocab → every occurrence is a (negative) OOV id
    val out = VocabOps.tokenize(docs, "doc_id", "text",
      VocabOps.coverageVocab(noTokens, "word", 9500), oovBuckets = 7)
      .collect().map(_.getLong(2))
    assert(out.length == 3 && out.forall(id => id < 0 && id >= -7))
  }

  test("tokenize assigns dense frequency-rank ids and negative OOV buckets") {
    val docs = Seq((1L, "aa aa aa bb bb zz"), (2L, "bb aa qq")).toDF("doc_id", "text")
    val toks = docs.select(explode(TextFunctions.tokens(lower($"text"))).as("word"))
    // 60% coverage: aa(×4) alone covers 4/9=44%, aa+bb(×3)=78% → vocab {aa, bb}
    val vocab = VocabOps.coverageVocab(toks, "word", 6000)
    val out = VocabOps.tokenize(docs, "doc_id", "text", vocab, oovBuckets = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 0L)) == 0L && out((1L, 1L)) == 0L)  // aa = rank 0
    assert(out((1L, 3L)) == 1L)                          // bb = rank 1
    assert(out((1L, 5L)) < 0L)                           // zz is OOV, negative
    assert(out((2L, 2L)) < 0L)                           // qq OOV
    assert(out((2L, 0L)) == 1L && out((2L, 1L)) == 0L)
    // OOV ids are deterministic and within the bucket range
    assert(out((1L, 5L)) >= -10L && out((1L, 5L)) <= -1L)
  }
}

class BpeMergesSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.functions.VocabOps

  private def run(words: Seq[(String, Long)], merges: Int) =
    VocabOps.bpeMerges(words.toDF("word", "f"), "word", "f", merges)
      .orderBy("step").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("cnt")))

  test("bpeMerges reproduces the hand-computed merge sequence") {
    // w0: ab:3=[a,b]  abc:2=[a,b,c]  bcd:1=[b,c,d]
    // (a,b)=5 -> merge; (ab,c)=2 -> merge; tie (b,c)=(c,d)=1 -> lexicographic
    // (b,c); then (bc,d)=1; then NO pairs left -> only 4 of 5 steps emitted
    val out = run(Seq(("ab", 3L), ("abc", 2L), ("bcd", 1L)), merges = 5)
    assert(out.toSeq == Seq(
      (1, "a", "b", 5L), (2, "ab", "c", 2L), (3, "b", "c", 1L), (4, "bc", "d", 1L)))
  }

  test("bpeMerges skips self-pairs (abab fuses once, ab+ab is not a candidate)") {
    val out = run(Seq(("abab", 2L)), merges = 3)
    assert(out.toSeq == Seq((1, "a", "b", 4L)),
      "after [ab, ab] the only adjacent pair is a self-pair and must not merge")
  }

  test("bpeMerges frequency-weights pair counts") {
    // xy appears in a frequent word and a rare one: cnt = 10 + 1
    val out = run(Seq(("xy", 10L), ("zxy", 1L), ("pq", 5L)), merges = 1)
    assert(out.toSeq == Seq((1, "x", "y", 11L)))
  }

  test("bpeMerges is deterministic under repartition") {
    val rng = new scala.util.Random(17)
    val words = (0 until 300).map { i =>
      (Seq.fill(rng.nextInt(6) + 2)(('a' + rng.nextInt(5)).toChar).mkString,
        (rng.nextInt(20) + 1).toLong)
    }.groupBy(_._1).map { case (w, v) => (w, v.map(_._2).sum) }.toSeq
    val a = run(words, 4)
    val b = VocabOps.bpeMerges(words.toDF("word", "f").repartition(7), "word", "f", 4)
      .orderBy("step").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("cnt")))
    assert(a.toSeq == b.toSeq)
  }

  /** Driver-side reference: apply non-self merges in order, overlap-free
    * left-to-right (equivalent to the per-position rewrite for l != r). */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString)
    merges.foreach { case (l, r) =>
      val out = scala.collection.mutable.Buffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toIndexedSeq
    }
    syms
  }

  private def encode(words: Seq[String], merges: Seq[(String, String)]): Map[String, Seq[String]] = {
    val m = merges.zipWithIndex
      .map { case ((l, r), i) => (i + 1, l, r) }.toDF("step", "lhs", "rhs")
    VocabOps.bpeEncode(words.toDF("word"), "word", m)
      .collect().map(r => r.getAs[String]("word") -> r.getSeq[String](1)).toMap
  }

  test("bpeEncode applies merges in training order") {
    // order matters: (a,b) then (ab,c) builds "abc"; reversed it cannot
    val ms = Seq(("a", "b"), ("ab", "c"))
    assert(encode(Seq("abc"), ms)("abc") == Seq("abc"))
    assert(encode(Seq("abc"), ms.reverse)("abc") == Seq("ab", "c"))
  }

  test("wordPieceMerges picks the likelihood-gain pair where BPE would pick the count pair") {
    // pair counts: (a,b)=10 beats (c,d)=3 on raw count (BPE's choice),
    // but a/b are common (100 each) while c/d are rare (6 each):
    // score(ab) = 10e9/10000 = 1_000_000; score(cd) = 3e9/36 = 83_333_333
    val words = Seq(("ab", 10L), ("a", 90L), ("b", 90L), ("cd", 3L),
      ("c", 3L), ("d", 3L))
    val bpe = run(words, 1)
    assert(bpe.head == (1, "a", "b", 10L), "BPE control: raw count wins")
    val wp = VocabOps.wordPieceMerges(words.toDF("word", "f"), "word", "f", 1)
      .collect().map(r => (r.getAs[Int]("step"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("cnt"), r.getAs[Long]("score_nano")))
    assert(wp.head == (1, "c", "d", 3L, 3000000000L / 36L))
  }

  test("wordPieceMerges is deterministic under repartition and skips self-pairs") {
    val rng = new scala.util.Random(29)
    val words = (0 until 300).map { i =>
      (Seq.fill(rng.nextInt(6) + 2)(('a' + rng.nextInt(5)).toChar).mkString,
        (rng.nextInt(20) + 1).toLong)
    }.groupBy(_._1).map { case (w, v) => (w, v.map(_._2).sum) }.toSeq
    def go(df: org.apache.spark.sql.DataFrame) =
      VocabOps.wordPieceMerges(df, "word", "f", 4).orderBy("step").collect()
        .map(r => (r.getAs[Int]("step"), r.getAs[String]("lhs"),
          r.getAs[String]("rhs"), r.getAs[Long]("cnt"), r.getAs[Long]("score_nano")))
    val a = go(words.toDF("word", "f"))
    val b = go(words.toDF("word", "f").repartition(7))
    assert(a.toSeq == b.toSeq)
    assert(a.forall { case (_, l, r, _, _) => l != r }, "self-pair merged")
  }

  test("wordPieceEncode: greedy longest match with single-char fallback") {
    val vocab = Seq("a", "b", "c", "ab", "abc").toDF("piece")
    val out = VocabOps.wordPieceEncode(
      Seq("abcb", "cabd", "abab", "").toDF("word"), "word", vocab)
      .collect().map(r => r.getAs[String]("word") -> r.getSeq[String](1)).toMap
    assert(out("abcb") == Seq("abc", "b"), "longest match abc beats ab")
    assert(out("cabd") == Seq("c", "ab", "d"), "d falls back to the single char")
    assert(out("abab") == Seq("ab", "ab"))
    assert(!out.contains(""), "empty words are dropped")
    out.foreach { case (w, ps) => assert(ps.mkString == w, s"respell $w") }
  }

  test("bpeEncode matches the driver reference on random words and merges") {
    val rng = new scala.util.Random(23)
    val words = (0 until 200).map(_ =>
      Seq.fill(rng.nextInt(9) + 1)(('a' + rng.nextInt(4)).toChar).mkString).distinct
    val merges = Seq(("a", "b"), ("c", "d"), ("ab", "a"), ("b", "c"), ("aba", "b"))
    val out = encode(words, merges)
    words.foreach { w =>
      assert(out(w) == refEncode(w, merges), s"word $w")
      assert(out(w).mkString == w, s"pieces must respell the word: $w")
    }
  }

  test("bpeEncode on the training words equals the trainer's final state") {
    val words = Seq(("abcd", 4L), ("abcab", 2L), ("dcba", 1L))
    val mergesDf = VocabOps.bpeMerges(words.toDF("word", "f"), "word", "f", 3)
    val ms = mergesDf.orderBy("step").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
    val enc = encode(words.map(_._1), ms)
    words.map(_._1).foreach { w =>
      assert(enc(w) == refEncode(w, ms), s"word $w")
    }
  }

  test("bpeEncode handles unseen symbols (no merge applies)") {
    assert(encode(Seq("zzz"), Seq(("a", "b")))("zzz") == Seq("z", "z", "z"))
  }

  test("merge trainers release per-round checkpoint blocks (bounded pinned RDDs after return)") {
    // Each merge round lazily checkpoints the rewritten word table; the
    // previous round's frame must be released once the next round's
    // materializes (the connectedComponents discipline — GraphOpsSpec),
    // or a deep merge budget pins one word-table frame per round for the
    // whole call. After a 5-merge train the block manager may hold only
    // the per-step 1-row eager `best` frames (merges of them) plus
    // nothing else from the loop.
    val sc = spark.sparkContext
    val words = Seq(("abcde", 30L), ("abcab", 20L), ("deab", 11L),
      ("cdeab", 7L), ("bcd", 5L)).toDF("word", "f")
    for ((label, train) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
      ("bpeMerges", () => VocabOps.bpeMerges(words, "word", "f", 5)),
      ("wordPieceMerges", () => VocabOps.wordPieceMerges(words, "word", "f", 5)))) {
      val before = sc.getPersistentRDDs.keySet
      val out = train()
      assert(out.count() == 5L, s"$label trained 5 merges")
      val pinnedNew = sc.getPersistentRDDs.keySet -- before
      assert(pinnedNew.size <= 5,
        s"$label left ${pinnedNew.size} pinned RDDs (want ≤5: the 1-row " +
          "per-step best frames only — word-table rounds must be released)")
      sc.getPersistentRDDs.filterKeys(k => pinnedNew(k)).values
        .foreach(_.unpersist(blocking = false))
    }
  }
}
