package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: join a point column against an interval table
  * (`lo <= point < hi`) WITHOUT a broadcast-nested-loop or cartesian plan.
  *
  * Spark executes a bare non-equi join as BroadcastNestedLoopJoin (fine
  * only when one side is tiny) or a cartesian product (never fine). The
  * scale path is the classic bucketization: quantize the domain into
  * fixed-width buckets, explode each interval onto every bucket it spans,
  * equi-join point-bucket = interval-bucket, then re-check the exact
  * predicate. Both sides shuffle ONCE on the bucket key; the blowup is
  * bounded by ceil(interval_width / bucketWidth) + 1 rows per interval —
  * pick `bucketWidth` near the typical interval width so intervals
  * explode to O(1) buckets.
  *
  * Works for any orderable numeric domain (timestamps as epoch longs,
  * prices as cents, ...). Intervals are half-open [lo, hi).
  */
object RangeJoin {
  /** Join `points` (with numeric `pointCol`) to `intervals` (with numeric
    * `loCol`/`hiCol`, half-open) on containment. All three columns must be
    * integral (LongType-compatible); quantization is exact integer
    * arithmetic, so the result equals the naive theta join exactly. */
  def bucketed(points: DataFrame, intervals: DataFrame,
               pointCol: String, loCol: String, hiCol: String,
               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // overlapping names would make the join output ambiguous (or let the
    // working columns silently overwrite user data) — fail loudly instead
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals share column(s) ${overlap.mkString(", ")} — rename one side")
    val reserved = Set("__bucket", "__fd_m", "__b_lo", "__b_hi")
    val clash = (points.columns ++ intervals.columns).toSet.intersect(reserved)
    require(clash.isEmpty, s"column(s) ${clash.mkString(", ")} collide with RangeJoin internals")
    val p = withFloorDiv(points, "__bucket", col(pointCol), bucketWidth)
    // explode each interval onto the buckets it spans: floorDiv(lo) ..
    // floorDiv(hi - 1) (hi is exclusive; empty intervals span nothing)
    val iv0 = withFloorDiv(
      withFloorDiv(intervals.where(col(loCol) < col(hiCol)),
        "__b_lo", col(loCol), bucketWidth),
      "__b_hi", col(hiCol) - 1, bucketWidth)
    val iv = iv0
      .withColumn("__bucket", explode(sequence(col("__b_lo"), col("__b_hi"))))
      .drop("__b_lo", "__b_hi")
    p.join(iv, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Append `out` = exact int64 floor division of `x` by `w`. Subtracting
    * pmod first makes the numerator an exact multiple, so truncating SQL
    * `div` IS floor division even for negatives — and everything stays in
    * int64 (a double `/` would corrupt epoch-nanosecond magnitudes). The
    * `div` operator is only reachable through expr(), so the operand is
    * staged as a column with a private name — user column names never
    * enter a SQL string. */
  private def withFloorDiv(df: DataFrame, out: String, x: Column, w: Long): DataFrame =
    df.withColumn("__fd_m", x - pmod(x, lit(w)))
      .withColumn(out, expr(s"__fd_m div ${w}L"))
      .drop("__fd_m")
}
