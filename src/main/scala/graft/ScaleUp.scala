package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× scale-up of the driver's sf0.1 snapshot — bench input
  * for scale points the driver does not ship (TESTDATA.md stops at sf0.1).
  *
  * The relational tables replicate with DISJOINT key spaces per copy
  * (copy k of orders references copy k of customers, etc.), so join
  * selectivities, group cardinalities per key, and skew shape match the
  * generator's own scaling — exactly how TPC-H scales (more rows of the
  * same distributions; region/nation stay fixed). The corpus tables scale
  * without manufacturing cross-copy near-duplicates:
  *
  *   - documents: every token of copy k > 0 gets a `⊕k` suffix, so shingle
  *     sets across copies are DISJOINT — the dup/near-dup rate per copy
  *     stays the original corpus's rate (pair counts scale ~linearly, as a
  *     real 10× corpus would), instead of every doc gaining 9 artificial
  *     twins (pair counts would scale quadratically and any dedup bench
  *     would measure the replication artifact, not the operator).
  *   - embeddings: copy k multiplies a deterministic ±1 sign pattern
  *     (seeded by k) into every vector; norms and intra-copy geometry are
  *     exactly preserved, cross-copy cosines scatter to ≈ ±1/√dim — far
  *     below any dedup threshold.
  *
  * Usage: runMain graft.ScaleUp [srcDir] [dstDir] [copies]
  * Defaults: /root/testdata/sf0.1 → /tmp/graft_sf1 × 10.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.getOrCreate("graft-scaleup")
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }

    // fixed dimensions (TPC-H does not scale these)
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    /** N copies with each key column offset by k·stride (strides exceed
      * every source key, so copies occupy disjoint, referentially-aligned
      * key ranges). */
    def replicate(df: DataFrame, strides: Map[String, Long]): DataFrame =
      (0 until copies).map { k =>
        strides.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, (col(c) + lit(k * s)).cast(d.schema(c).dataType))
        }
      }.reduce(_.unionByName(_))

    val C = 1000000L  // custkey stride
    val O = 10000000L // orderkey stride
    val P = 1000000L  // partkey stride
    val S = 100000L   // suppkey stride
    wr(replicate(rd("customer"), Map("c_custkey" -> C)), "customer")
    wr(replicate(rd("supplier"), Map("s_suppkey" -> S)), "supplier")
    wr(replicate(rd("part"), Map("p_partkey" -> P)), "part")
    wr(replicate(rd("orders"), Map("o_orderkey" -> O, "o_custkey" -> C)), "orders")
    wr(replicate(rd("lineitem"),
      Map("l_orderkey" -> O, "l_partkey" -> P, "l_suppkey" -> S)), "lineitem")
    // 10× users over the same time window = a 10× busier event stream;
    // per-user session structure is untouched
    wr(replicate(rd("events"),
      Map("event_id" -> 100000000L, "user_id" -> 1000000L)), "events")

    val docs = rd("documents")
    wr((0 until copies).map { k =>
      val d = docs.withColumn("doc_id", col("doc_id") + lit(k * 1000000L))
      if (k == 0) d
      else d
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1" + "⊕" + k))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_.unionByName(_)), "documents")

    val emb = rd("embeddings")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    wr((0 until copies).map { k =>
      val e = emb.withColumn("vec_id", col("vec_id") + lit(k * 100000L))
      if (k == 0) e
      else {
        val rng = new scala.util.Random(k)
        val signs = Seq.fill(dim)(if (rng.nextBoolean()) 1.0f else -1.0f)
        e.withColumn("embedding",
          zip_with(col("embedding"), typedlit(signs), (v, s) => v * s))
      }
    }.reduce(_.unionByName(_)), "embeddings")

    spark.stop()
  }
}
