package graft.expr

import graft.SparkSpec
import graft.functions.{DedupOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** The native CodegenFallback kernels exist purely for speed — each one
  * must be bit-identical to the portable lambda/built-in formulation it
  * replaces (that equivalence is what makes the DuckDB oracles valid for
  * the fast paths). These specs pin that invariant.
  */
class NativeKernelSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val texts = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy cat",
    3L -> "Hello  World\twith   ODD whitespace ",
    4L -> "one two",
    5L -> "")

  test("Hash60.hash (JVM) == conv(substr(md5)) column formulation") {
    val df = texts.toDF("id", "t")
    val got = df.select($"t", DedupOps.hash60($"t").as("h")).collect()
    got.foreach { r =>
      assert(r.getLong(1) == Hash60.hash(r.getString(0)), s"for '${r.getString(0)}'")
    }
  }

  test("word_ngram_hashes == hash60 over word_ngrams strings") {
    val df = texts.toDF("id", "t")
    val rows = df.select(
      DedupOps.shingleHashes($"t", 3).as("native"),
      transform(DedupOps.shingles($"t", 3), s => DedupOps.hash60(s)).as("viaStrings"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("native simhash64 == lambda simhash formulation") {
    val df = texts.toDF("id", "t")
    val rows = df.select(
      call_function("simhash64", $"t").as("native"),
      DedupOps.simhash($"t").as("lambda")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("vec_eq_count counts agreements; null on length mismatch") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 9L, 3L)),
      (Seq(1L, 2L), Seq(1L, 2L)),
      (Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
    val got = df.select(call_function("vec_eq_count", $"a", $"b")).collect()
    assert(got(0).getInt(0) == 2)
    assert(got(1).getInt(0) == 2)
    assert(got(2).isNullAt(0))
  }

  test("vec_dot matches sequential fold; null on length mismatch") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(1.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val got = df.select(call_function("vec_dot", $"a", $"b")).collect()
    assert(got(0).getDouble(0) == (4.0 + 10.0 + 18.0))
    assert(got(1).isNullAt(0))
  }

  test("native srp_bucket == quantized lambda srpBits fold") {
    val df = Seq(
      (1L, Seq(0.5f, -0.25f, 0.125f, 0.9f)),
      (2L, Seq(-0.1f, -0.2f, 0.3f, -0.4f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val rows = df.select(
      SimilarityOps.srpBucket($"v", 8).as("native"),
      aggregate(SimilarityOps.srpBits($"v", 8), lit(0L), (acc, b) => acc * 2 + b).as("lambda"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("native z_value == lambda Morton fold on random coordinates") {
    val rng = new scala.util.Random(31)
    val df = Seq.fill(100)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
      .toDF("x", "y")
    val rows = df.select(
      call_function("z_value", $"x", $"y", lit(16)).as("native"),
      graft.operators.ZOrder.zValue($"x", $"y", 16).as("lambda"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("codegen'd kernels compile and match eval with codegen fallback DISABLED") {
    // spark.sql.codegen.fallback=false turns a janino failure in our
    // doGenCode implementations into a hard error instead of a silent
    // regression to interpreted eval
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq(
        (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f), Seq(1L, 2L, 3L), Seq(1L, 9L, 3L), 3L, -4L),
        (Seq(0.5f, -1.5f), Seq(2.0f, 2.0f), Seq(7L, 8L), Seq(7L, 8L), 2L, 63L))
        .toDF("a", "b", "x", "y", "p", "q")
      val rows = df.select(
        call_function("vec_dot", $"a", $"b").as("dot"),
        call_function("vec_eq_count", $"x", $"y").as("eq"),
        call_function("int_pow", $"p", $"q").as("pw"),
        call_function("z_value", $"p", $"q", lit(2)).as("zv")).collect()
      assert(rows(0).getDouble(0) == (4.0 + 10.0 + 18.0))
      assert(rows(0).getInt(1) == 2)
      assert(rows(0).getLong(2) == 81L) // 3 ^ abs(-4)
      // z of (3=0b11, -4 low 2 bits = 0b00): x bits at odd positions → 0b1010
      assert(rows(0).getLong(3) == 10L)
      assert(rows(1).getDouble(0) == (1.0 - 3.0))
      assert(rows(1).getInt(1) == 2)
      // 2^63 wraps to Long.MinValue on the JVM — the reference's
      // release-mode wrapping semantics
      assert(rows(1).getLong(2) == Long.MinValue)
      // null paths: length mismatch and null element
      val nulls = Seq((Seq(1.0f), Seq(1.0f, 2.0f), Seq(1L), Seq(2L, 3L)))
        .toDF("a", "b", "x", "y")
        .select(call_function("vec_dot", $"a", $"b"), call_function("vec_eq_count", $"x", $"y"))
        .collect()
      assert(nulls(0).isNullAt(0) && nulls(0).isNullAt(1))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("nfc_normalize composes decomposed sequences, codegen fallback DISABLED") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq(
        "fa\u0300st",                      // a + combining grave -> U+00E0
        "de\u0301ja\u0300 vu",            // multiple combining marks
        "plain ascii",                     // fast path: returned as-is
        "\u00e9clair",                     // already composed: unchanged
        "").toDF("s")
      val out = df.select(call_function("nfc_normalize", $"s").as("n"),
        length(call_function("nfc_normalize", $"s")).as("len")).collect()
      assert(out(0).getString(0) == "f\u00e0st" && out(0).getInt(1) == 4)
      assert(out(1).getString(0) == "d\u00e9j\u00e0 vu" && out(1).getInt(1) == 7)
      assert(out(2).getString(0) == "plain ascii")
      assert(out(3).getString(0) == "\u00e9clair")
      assert(out(4).getString(0) == "")
      // null propagates
      val n = Seq(Option.empty[String]).toDF("s")
        .select(call_function("nfc_normalize", $"s")).collect()
      assert(n(0).isNullAt(0))
      // matches the JDK reference on arbitrary strings
      val raw = "o\u0302me\u0301ga"
      val ref = java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
      val got = Seq(raw).toDF("s")
        .select(call_function("nfc_normalize", $"s")).head().getString(0)
      assert(got == ref)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("normalizeText canonicalizes case, whitespace, and encoding together") {
    val df = Seq(("A\u0300  Tale \tOF\n  two", 1L)).toDF("t", "id")
    val out = df.select(graft.functions.TextFunctions.normalizeText($"t")).head().getString(0)
    assert(out == "\u00e0 tale of two")
  }

  test("minhash lambda signature == explode-aggregate signatures") {
    val df = texts.toDF("doc_id", "text")
    val viaLambda = df
      .select($"doc_id", DedupOps.minhashSignature($"text", k = 16).as("sig"))
      .where($"sig".isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaAgg = DedupOps.minhashSignatures(df, "text", "doc_id", k = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaLambda == viaAgg)
    // doc 5 is empty and doc 4 has < 3 tokens: no shingles → no signature
    assert(!viaAgg.contains(4L) && !viaAgg.contains(5L))
  }
}
