package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Dtype tolerance of the shared table loader: the driver has shipped
  * `events.ts` as INT64 epoch-nanos and as timestamp[us]; every physical
  * encoding must normalize to one canonical TIMESTAMP_NTZ with the same
  * instants, so no query ever hard-codes the encoding it saw at write
  * time (the round-8 regression).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val baseNs = 1700000000000000000L // 2023-11-14T22:13:20Z in nanos

  test("normalizeTs: Long epoch-nanos → TIMESTAMP_NTZ, instants preserved") {
    val df = Seq(baseNs, baseNs + 90L * 1000000000L).toDF("ts")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampNTZType)
    val ns = out.select(Tables.epochNs(col("ts"))).as[Long].collect().sorted
    assert(ns.sameElements(Array(baseNs, baseNs + 90L * 1000000000L)))
  }

  test("normalizeTs: TimestampType → TIMESTAMP_NTZ, same wall clock under UTC") {
    val df = Seq(baseNs / 1000, baseNs / 1000 + 5000000L).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(df.schema("ts").dataType == TimestampType)
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampNTZType)
    val us = out.select(unix_micros(col("ts").cast(TimestampType))).as[Long].collect().sorted
    assert(us.sameElements(Array(baseNs / 1000, baseNs / 1000 + 5000000L)))
  }

  test("normalizeTs: TIMESTAMP_NTZ passes through unchanged") {
    val df = Seq(baseNs / 1000).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampNTZType)
    assert(out.select(Tables.epochNs(col("ts"))).as[Long].head() == baseNs)
  }

  test("normalizeTs: frames without a ts column are untouched") {
    val df = Seq((1, "a")).toDF("id", "name")
    assert(Tables.normalizeTs(df).collect().sameElements(df.collect()))
  }
}
