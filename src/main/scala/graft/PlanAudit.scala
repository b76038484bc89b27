package graft

/** Physical-plan audit tool: prints `explain("formatted")` for the named
  * queries (or a default set of plan-interesting ones) against a given SF
  * dir — the source of PLANS.md. Usage:
  *
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.001 q20_ngram_jaccard q46_ivf_ann"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q20_ngram_jaccard", "q21_minhash_pairs", "q24_ann_lsh", "q46_ivf_ann")
    val spark = GraftSession.getOrCreate("graft-plan-audit")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    println("\n===== entry =====")
    SparkEntry.entry(spark).explain("formatted")
    spark.stop()
  }
}
