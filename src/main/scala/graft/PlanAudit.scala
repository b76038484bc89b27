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
      } else if (n == "q113_iteration") {
        // the gate plan truncates at each iteration's localCheckpoint —
        // this pseudo-name explains ONE un-checkpointed iteration (the
        // contribution join + re-rank), the shape the 100 TB claim is about
        import org.apache.spark.sql.functions._
        val o = spark.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey"), col("o_custkey"))
        val l = spark.read.parquet(s"$dir/lineitem.parquet").select(col("l_orderkey"), col("l_suppkey"))
        import org.apache.spark.storage.StorageLevel
        val e = o.join(l, o("o_orderkey") === l("l_orderkey"))
          .select((col("o_custkey") * 2).as("s"), (col("l_suppkey") * 2 + 1).as("d")).distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        val deg = e.groupBy(col("s").as("id")).agg(count(lit(1)).as("deg"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val nodes = e.select(col("s").as("id")).union(e.select(col("d").as("id"))).distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        nodes.count() // materialize caches as the operator's n-count does
        val ranks = nodes.withColumn("r", lit(0.000625)).localCheckpoint(true)
        val rd = ranks.join(deg, Seq("id"), "left")
        val contrib = e.join(rd.where(col("deg").isNotNull), e("s") === rd("id"))
          .groupBy(e("d").as("id")).agg(sum(col("r") / col("deg")).as("c"))
        nodes.join(contrib, Seq("id"), "left")
          .select(col("id"), (lit(0.15 / 1600) + lit(0.85) * (coalesce(col("c"), lit(0.0)) + lit(0.0001))).as("r"))
          .explain("formatted")
      } else SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    println("\n===== entry =====")
    SparkEntry.entry(spark).explain("formatted")
    spark.stop()
  }
}
