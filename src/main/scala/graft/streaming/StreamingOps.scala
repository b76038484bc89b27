package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming counterparts of the batch pipeline operators — the pieces a
  * continuously-ingesting corpus pipeline needs beyond the reference's
  * Listen surface (SURVEY.md §2.6 notes the reference has no watermarks,
  * windows, or late-data handling; these are the Spark-native upgrades).
  *
  * Scale design: every operator here is a standard stateful Structured
  * Streaming construct — state is keyed and partitioned by Spark's state
  * store, watermarks bound state size, and nothing collects to the driver.
  */
object StreamingOps {

  /** Streaming exact dedup: first row per canonical-text fingerprint wins;
    * duplicates arriving within the watermark horizon are dropped. State
    * for a fingerprint is evictable once the watermark passes it — the
    * streaming analog of the batch [[graft.functions.DedupOps.exactDedup]]
    * with bounded state. */
  def exactDedupStream(df: DataFrame, textCol: String,
                       tsCol: String, watermarkDelay: String): DataFrame =
    df.withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Gap-based sessionization as a streaming aggregation: one output row
    * per (key, session window), closed when the watermark passes the gap —
    * the streaming analog of the batch q30 window-lag formulation. */
  def sessionize(df: DataFrame, tsCol: String, keyCol: String,
                 gap: String, watermarkDelay: String,
                 aggs: Seq[Column] = Seq(count(lit(1)).as("n_events"))): DataFrame = {
    require(aggs.nonEmpty, "sessionize needs at least one aggregate column")
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("session"), col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session.start"))
      .withColumn("session_end", col("session.end"))
      .drop("session")
  }

  /** Watermarked stream-stream equi-join with a time-range bound: right
    * rows join left rows with `rightTs` in `[leftTs - lookback, leftTs]`.
    * Both sides are watermarked so join state is evicted — the streaming
    * as-of-neighborhood primitive (the batch exact as-of join is
    * [[graft.operators.AsOfJoin]]). */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   lookback: String, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    // per-side column refs — bare col() would be ambiguous whenever the
    // two streams share key/timestamp column names
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookback") &&
        r(rightTs) <= l(leftTs))
  }
}
