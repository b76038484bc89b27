package graft

import graft.functions.DedupOps
import org.apache.spark.sql.functions._

/** Temporary perf probe (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-scratch")
    graft.expr.GraftFunctions.register(spark)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // warm JIT/codegen once
    time("warm explode+hash")(docs.select(explode(DedupOps.shingleHashes(col("text"), 3))).count())
    // stage 1: explode + hash + persist
    val ex = docs
      .select(col("doc_id").as("id"), DedupOps.shingleHashes(col("text"), 3).as("sh"))
      .select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("materialize ex")(ex.count())
    // stage 2: self-join + pair agg
    val common = ex.select(col("h"), col("id").as("id_a"), col("sz").as("sz_a"))
      .join(ex.select(col("h"), col("id").as("id_b"), col("sz").as("sz_b")), Seq("h"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b").agg(count(lit(1)).as("c"))
    val pairs = common.select(col("id_a"), col("id_b"),
      (col("c").cast("double") / (col("sz_a") + col("sz_b") - col("c"))).as("jaccard"))
      .where(col("jaccard") >= 0.3)
    time("pairs count")(println("pairs=" + pairs.count()))
    // full q20 again (all-in-one, fresh)
    spark.sharedState.cacheManager.clearCache()
    time("q20 full")(
      DedupOps.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.2, 0).count())
    spark.sharedState.cacheManager.clearCache()
    time("q26 full")(
      DedupOps.dedupClusters(DedupOps.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.3, 0)).count())
    spark.stop()
  }
}
