package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierOpsSpec extends SparkSpec {
  import spark.implicits._

  private def occOf(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), explode(TextFunctions.tokens(lower(col("text")))).as("word"))

  test("naiveBayesLogOdds matches hand-computed smoothed counts, prior included") {
    // seed: doc 0 (pos) = "good good", doc 1 (neg) = "bad"; score doc 2 = "good bad"
    val occ = occOf(Seq(0L -> "good good", 1L -> "bad", 2L -> "good bad"))
    val seed = Seq((0L, true), (1L, false)).toDF("doc_id", "is_good")
    val got = ClassifierOps.naiveBayesLogOdds(occ, "doc_id", "word", seed, "is_good", alpha = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_odds")).toMap
    // counts: good (cp=2, cn=0), bad (cp=0, cn=1); tp=2, tn=1, v=2
    val (tp, tn, v, a) = (2.0, 1.0, 2.0, 0.5)
    def llr(cp: Double, cn: Double) =
      math.log((cp + a) / (tp + a * v)) - math.log((cn + a) / (tn + a * v))
    val prior = math.log(1.0 / 1.0)
    assert(math.abs(got(0L) - (2 * llr(2, 0) + prior)) < 1e-12)
    assert(math.abs(got(1L) - (llr(0, 1) + prior)) < 1e-12)
    assert(math.abs(got(2L) - (llr(2, 0) + llr(0, 1) + prior)) < 1e-12)
    assert(got(0L) > 0 && got(1L) < 0)
  }

  test("naiveBayesLogOdds validate=true fails loudly on a one-class seed; default stays lazy") {
    val occ = occOf(Seq(0L -> "good good", 1L -> "fine too", 2L -> "score me"))
    val oneClass = Seq((0L, true), (1L, true)).toDF("doc_id", "y")
    // documented trap: the lazy default surfaces only at ACTION time, as
    // an opaque ANSI DIVIDE_BY_ZERO from deep inside the prior — nothing
    // names the actual mistake (with ANSI off it would silently emit
    // ±Infinity scores instead)
    val late = intercept[Exception] {
      ClassifierOps.naiveBayesLogOdds(occ, "doc_id", "word", oneClass, "y", 0.5)
        .collect()
    }
    assert(late.getMessage.contains("DIVIDE_BY_ZERO"))
    // the guard: validate forces the model-path precondition at call time
    val e = intercept[IllegalArgumentException] {
      ClassifierOps.naiveBayesLogOdds(occ, "doc_id", "word", oneClass, "y", 0.5,
        validate = true)
    }
    assert(e.getMessage.contains("BOTH classes"))
    // a two-class seed passes validation and scores identically to the default
    val seed = Seq((0L, true), (1L, false)).toDF("doc_id", "y")
    val a = ClassifierOps.naiveBayesLogOdds(occ, "doc_id", "word", seed, "y", 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_odds")).toMap
    val b = ClassifierOps.naiveBayesLogOdds(occ, "doc_id", "word", seed, "y", 0.5,
        validate = true)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_odds")).toMap
    assert(a.keySet == b.keySet && a.forall { case (k, v) => math.abs(v - b(k)) < 1e-12 })
  }

  test("naiveBayesLogOdds scores words the seed never saw via the smoothed-zero fallback") {
    val occ = occOf(Seq(0L -> "good", 1L -> "bad", 2L -> "novel"))
    val seed = Seq((0L, true), (1L, false)).toDF("doc_id", "y")
    val got = ClassifierOps.naiveBayesLogOdds(occ, "doc_id", "word", seed, "y", alpha = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_odds")).toMap
    // tp=1, tn=1, v=2 → unseen llr = ln(tn+αv) − ln(tp+αv) = 0; prior = 0
    assert(math.abs(got(2L)) < 1e-12)
  }

  test("dsirLogWeights reproduces the target/raw log-ratio sum; target docs rank high") {
    // target dialect uses "alpha beta", raw background "gamma delta"
    val docs = (0L to 9L).map(i =>
      i -> (if (i < 5) "alpha beta alpha" else "gamma delta gamma")) ++ Seq(10L -> "alpha beta")
    val occ = occOf(docs)
    val target = (0L to 4L).toDF("doc_id")
    val B = 64
    val got = ClassifierOps.dsirLogWeights(occ, "doc_id", "word", target, buckets = B, alpha = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_weight")).toMap
    assert(got.size == 11)
    // local oracle over the same md5 bucketing
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val occL = docs.flatMap { case (id, t) => t.split(" ").map(w => (id, h60(w) % B)) }
    val raw = occL.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tgt = occL.filter(_._1 < 5).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val (tr, tt, a) = (occL.size.toDouble, occL.count(_._1 < 5).toDouble, 0.5)
    def lw(b: Long) =
      math.log((tgt.getOrElse(b, 0L) + a) / (tt + a * B)) -
        math.log((raw(b) + a) / (tr + a * B))
    docs.foreach { case (id, t) =>
      val exp = t.split(" ").map(w => lw(h60(w) % B)).sum
      assert(math.abs(got(id) - exp) < 1e-9, s"doc $id")
    }
    // the held-out target-dialect doc outranks every background doc
    assert((5L to 9L).forall(b => got(10L) > got(b)))
  }

  test("naiveBayesModel + scoreWithModel reproduce naiveBayesLogOdds exactly") {
    val occ = occOf(Seq(0L -> "good good fine", 1L -> "bad awful", 2L -> "good bad novel"))
    val seed = Seq((0L, true), (1L, false)).toDF("doc_id", "y")
    val direct = ClassifierOps.naiveBayesLogOdds(occ, "doc_id", "word", seed, "y", 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_odds")).toMap
    val (model, unseen, prior) =
      ClassifierOps.naiveBayesModel(occ, "doc_id", "word", seed, "y", 0.5)
    val viaModel = ClassifierOps.scoreWithModel(occ, "doc_id", "word", model, unseen, prior)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_odds")).toMap
    assert(direct.keySet == viaModel.keySet)
    direct.foreach { case (k, v) => assert(math.abs(v - viaModel(k)) < 1e-9, s"doc $k") }
  }

  test("dsirScoreDocs (literal-folded model) matches dsirLogWeights per doc") {
    val docs = Seq(
      (0L, "alpha beta gamma alpha"), (1L, "delta epsilon zeta"),
      (2L, "alpha gamma beta"), (3L, "theta iota kappa lambda"),
      (4L, ""))
      .toDF("doc_id", "text")
    val occ = docs.where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), explode(TextFunctions.tokens(lower(col("text")))).as("word"))
    val target = Seq(0L, 2L).toDF("doc_id")
    val model = ClassifierOps.dsirModel(occ, "doc_id", "word", target, buckets = 32, alpha = 0.5)
    assert(model.count() <= 32)
    val viaAgg = ClassifierOps.dsirLogWeights(occ, "doc_id", "word", target,
      buckets = 32, alpha = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_weight")).toMap
    val viaFold = ClassifierOps.dsirScoreDocs(docs, "text", model, buckets = 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dsir_score")).toMap
    // parity on every doc with tokens; the empty doc scores 0 map-only
    // (it has no occurrence rows, so the aggregate path omits it)
    assert(viaAgg.keySet == Set(0L, 1L, 2L, 3L))
    viaAgg.foreach { case (id, w) => assert(math.abs(w - viaFold(id)) < 1e-9, s"doc $id") }
    assert(viaFold(4L) == 0.0)
  }

  test("gumbelKey is deterministic and strictly increasing in log-weight") {
    val df = Seq((1L, 0.0), (1L, 1.0), (2L, 0.0)).toDF("id", "lw")
      .select(col("id"), col("lw"),
        ClassifierOps.gumbelKey(col("id"), col("lw")).as("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val byRow = df.map { case (id, lw, k) => (id, lw) -> k }.toMap
    assert(byRow((1L, 1.0)) - byRow((1L, 0.0)) == 1.0) // same noise, weight shifts key
    assert(byRow((1L, 0.0)) != byRow((2L, 0.0)))       // different ids, different noise
  }

  test("knBigramModel: hand-computed KN probabilities; seen mass leaves discount headroom") {
    val docs = Seq("a b a b", "a c").toDF("text")
    val m = ClassifierOps.knBigramModel(docs, "text")
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        (r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("prob_micro"))).toMap
    // bigrams: (a,b)×2, (b,a)×1, (a,c)×1; B = 3
    assert(m.keySet == Set(("a", "b"), ("b", "a"), ("a", "c")))
    // P(b|a) = (2−.75)/3 + .75·(2/3)·(1/3) = 1.75/3 = 0.583333…
    assert(m(("a", "b")) == ((2L, 3L, 583333L)))
    // P(c|a) = (1−.75)/3 + .75·(2/3)·(1/3) = 0.25
    assert(m(("a", "c")) == ((1L, 3L, 250000L)))
    // P(a|b) = (1−.75)/1 + .75·(1/1)·(1/3) = 0.5
    assert(m(("b", "a")) == ((1L, 1L, 500000L)))
    // per context, seen mass stays under 1 — the discount reserves
    // backoff mass for unseen continuations
    val byCtx = m.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._3).sum)
    assert(byCtx.values.forall(s => s > 0 && s <= 1000000L))
  }

  test("knPerplexity: every backoff rung lands where hand arithmetic says") {
    val train = Seq("a b a b", "a c").toDF("text")
    val model = ClassifierOps.knBigramModel(train, "text")
    val out = ClassifierOps.knPerplexity(
        Seq((7L, "a b x c a"), (8L, "solo")).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("ll_sum_micro"),
          r.getAs[Long]("avg_nll_micro"))).toMap
    assert(!out.contains(8L)) // single-token doc has no pairs
    def lp(pMicro: Long): Long =
      math.floor(1e6 * math.log(pMicro / 1e6)).toLong
    // (a,b) seen = 583333; (b,x) seen ctx + novel cont -> clamp 1;
    // (x,c) and (c,a) novel ctx -> uniform 10^6 div |{a,b,c}| = 333333
    val expect = lp(583333L) + lp(1L) + 2 * lp(333333L)
    assert(out(7L) == ((4L, expect, -expect / 4)))
  }
}
