package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loads the driver-generated parquet tables for a scale-factor dir.
  *
  * All reads go through `spark.read.parquet` so Catalyst gets predicate
  * pushdown + column pruning for free; at cluster scale these would be
  * partitioned/bucketed external tables, but the call sites are identical.
  *
  * The loader is the ONE place that owns physical-encoding tolerance:
  * `events.ts` has shipped as INT64 epoch-nanos (surfaced as Long via
  * `nanosAsLong`) and as `timestamp[us]` (isAdjustedToUTC=false ⇒ Spark
  * reads TIMESTAMP_NTZ); either way callers see one canonical
  * TIMESTAMP_NTZ (UTC wall clock — the session timezone is pinned UTC in
  * [[GraftSession]], so NTZ↔TZ casts are instant-preserving). No query
  * may assume the physical type it happened to see when written.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Canonicalize `ts` to TIMESTAMP_NTZ regardless of physical encoding. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => // legacy INT64 epoch-nanos via nanosAsLong
        df.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case Some(TimestampType) => // instant type; UTC session ⇒ same wall clock
        df.withColumn("ts", col("ts").cast(TimestampNTZType))
      case _ => df // already TIMESTAMP_NTZ (or absent)
    }

  /** Epoch nanoseconds from the canonical TIMESTAMP_NTZ `ts` — matches
    * DuckDB's `epoch_ns(ts)` on the same parquet. The NTZ→TZ cast is
    * instant-preserving under the pinned-UTC session.
    */
  def epochNs(c: Column): Column = unix_micros(c.cast(TimestampType)) * lit(1000L)

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    all.map { n =>
      val df = load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
      n -> df
    }.toMap
}
