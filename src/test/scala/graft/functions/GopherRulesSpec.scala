package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  test("gopherQuality measures and gates on word-level rules") {
    val docs = Seq(
      (0L, Seq.fill(60)("steady").mkString(" ") + " the of"),   // passes all
      (1L, Seq.fill(10)("short").mkString(" ") + " the"),       // too few words
      (2L, Seq.fill(60)("a").mkString(" ") + " the of"),        // mean word len < 3
      (3L, Seq.fill(60)("steady").mkString(" ") + " # # # # # # # # the of"), // symbol ratio
      (4L, (1 to 60).map(i => s"$i$i$i$i").mkString(" ") + " still nothing"), // alpha frac low
      (5L, Seq.fill(60)("steady").mkString(" "))                // no stopwords
    ).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
      TextFunctions.gopherQuality($"text", minWords = 50, minStopwords = 2).as("g"))
      .select($"doc_id", $"g.*").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Int]("keep") == 1)
    assert(out(1L).getAs[Int]("keep") == 0 && out(1L).getAs[Int]("n_words") == 11)
    assert(out(2L).getAs[Int]("keep") == 0 &&
      out(2L).getAs[Double]("mean_word_len") < 3.0)
    assert(out(3L).getAs[Int]("keep") == 0 &&
      out(3L).getAs[Double]("symbol_word_ratio") > 0.1)
    assert(out(4L).getAs[Int]("keep") == 0 &&
      out(4L).getAs[Double]("alpha_word_frac") < 0.8)
    assert(out(5L).getAs[Int]("keep") == 0 &&
      out(5L).getAs[Int]("n_stop_present") == 0)
  }

  test("gopherQuality handles empty and whitespace-only text") {
    val out = Seq((0L, ""), (1L, "   ")).toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.gopherQuality($"text").as("g"))
      .select($"doc_id", $"g.*").collect()
    out.foreach { r =>
      assert(r.getAs[Int]("n_words") == 0)
      assert(r.getAs[Double]("mean_word_len") == 0.0)
      assert(r.getAs[Int]("keep") == 0)
    }
  }

  test("ngramsAll keeps multiplicity in document order") {
    val got = Seq((0L, "a b a b a")).toDF("doc_id", "text")
      .select(TextFunctions.ngramsAll($"text", 2).as("g"))
      .as[Seq[String]].head()
    assert(got == Seq("a b", "b a", "a b", "b a"))
    val short = Seq((0L, "one")).toDF("doc_id", "text")
      .select(TextFunctions.ngramsAll($"text", 2).as("g"))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("ngramRepetitionStats computes top and duplicate n-gram char fractions") {
    // "x y x y x y": normalized length 11; 2-grams: "x y"×3, "y x"×2
    //   top2 = 3*3/11; dup2 = (3*3 + 2*3)/(3*3 + 2*3) = 1.0
    val docs = Seq(
      (0L, "x y x y x y"),
      (1L, "all distinct words here now"),  // no repeated 2-gram
      (2L, "ab")                            // 1 token: no 2-grams at all
    ).toDF("doc_id", "text")
    val out = TextFunctions.ngramRepetitionStats(docs, "text", "doc_id", ns = Seq(2))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(math.abs(out(0L).getAs[Double]("top2_frac") - 9.0 / 11) < 1e-12)
    assert(out(0L).getAs[Double]("dup2_frac") == 1.0)
    assert(out(1L).getAs[Double]("dup2_frac") == 0.0)
    assert(out(1L).getAs[Double]("top2_frac") > 0.0) // most frequent occurs once
    assert(out(2L).getAs[Double]("top2_frac") == 0.0) // short doc present at 0.0
    assert(out(2L).getAs[Double]("dup2_frac") == 0.0)
  }

  test("ngramRepetitionStats tie-break picks the lexicographically smallest gram") {
    // "b a b a": "b a"×2, "a b"×1 → top is "b a" (count wins);
    // "c a c b c a c b": "c a"×2,"a c"×2,"c b"×2,"b c"×1 → tie on count 2,
    //   smallest gram "a c" (len 3): top2 = 2*3/15
    val docs = Seq((0L, "c a c b c a c b")).toDF("doc_id", "text")
    val out = TextFunctions.ngramRepetitionStats(docs, "text", "doc_id", ns = Seq(2))
      .collect().head
    assert(math.abs(out.getAs[Double]("top2_frac") - 6.0 / 15) < 1e-12)
  }
}
