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
      // q99's gate plan truncates the absorb lineage at its
      // localCheckpoint boundary — the pseudo-name explains the absorb
      // stage itself (reloaded bucketed store → broadcast semi-join →
      // pair scoring), the shape the lifecycle claim is about. Requires
      // the store table, so the gate query runs first.
      if (n == "q99_absorb") {
        import org.apache.spark.sql.functions.col
        SparkEntry.queries("q99_store_lifecycle")(spark, dir).count()
        val store = graft.sources.TableStore.loadTable(spark, "graft_q99_sig_store")
        val incr = spark.read.parquet(s"$dir/documents.parquet")
          .where(col("doc_id") >= 400)
        val newBanded = graft.functions.DedupOps.minhashStore(incr, "text", "doc_id")
        graft.functions.DedupOps.absorbDropIds(newBanded, store, 64, 0.5)
          .explain("formatted")
      } else SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    println("\n===== entry =====")
    SparkEntry.entry(spark).explain("formatted")
    spark.stop()
  }
}
