package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordNGramsSpec extends SparkSpec {
  import spark.implicits._

  private def ngrams(text: String, n: Int): Seq[String] = {
    GraftFunctions.register(spark)
    Seq(text).toDF("t")
      .select(call_function("word_ngrams", col("t"), lit(n)).as("g"))
      .head().getSeq[String](0)
  }

  test("builds lowercased distinct word n-grams") {
    assert(ngrams("The quick brown FOX the quick brown", 3).toSet ==
      Set("the quick brown", "quick brown fox", "brown fox the", "fox the quick"))
  }

  test("fewer tokens than n yields empty array") {
    assert(ngrams("one two", 3).isEmpty)
    assert(ngrams("", 3).isEmpty)
    assert(ngrams("   ", 3).isEmpty)
  }

  test("multi-whitespace and tabs tokenize like \\s+") {
    assert(ngrams("a  b\tc", 3) == Seq("a b c"))
  }

  test("matches the equivalent HOF formulation (old implementation)") {
    // NOTE: the HOF formulation itself crashes on < n tokens
    // (sequence(0,-1) is illegal) — the native expression handles that;
    // covered by the dedicated short-input test above.
    val texts = Seq("the quick brown fox jumps", "x y z x y z", "  padded   text here  ")
    GraftFunctions.register(spark)
    val df = texts.toDF("t")
    val toks = split(trim(regexp_replace(lower(col("t")), "\\s+", " ")), " ")
    val cnt = greatest(size(toks) - 2, lit(0))
    val hof = array_distinct(transform(sequence(lit(0), cnt - 1, lit(1)),
      i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
    val rows = df.select(
      array_sort(call_function("word_ngrams", col("t"), lit(3))).as("native"),
      array_sort(hof).as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }
}
