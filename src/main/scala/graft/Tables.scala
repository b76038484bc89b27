package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated parquet tables for a scale-factor dir.
  *
  * All reads go through `spark.read.parquet` so Catalyst gets predicate
  * pushdown + column pruning for free; at cluster scale these would be
  * partitioned/bucketed external tables, but the call sites are identical.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    all.map { n =>
      val df = load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
      n -> df
    }.toMap
}
