package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed grouped running sum (prefix sum).
  *
  * The naive `Window.partitionBy(group).orderBy(order)` with an unbounded
  * preceding frame ships every row of a group to ONE reducer — a
  * scale-killer when a group is corpus-sized (e.g. "all English documents"
  * in a token-packing job). This operator computes the same running sum in
  * two phases so no reducer ever sees more than ~1/B of the data:
  *
  *   1. bucket rows by quantile ranges of the order column (map-only);
  *   2. local running sum within (bucket, group) — bounded window groups;
  *   3. per-(bucket, group) subtotals (tiny: B × |groups| rows), cumulative
  *      offsets per group over that tiny table, broadcast-joined back.
  *
  * Bucketing is derived from an approx-quantile sketch of the order column
  * rather than `repartitionByRange`: the sketch is a pure deterministic
  * function of the data, while RangePartitioner's sampled boundaries depend
  * on RDD ids, so the two consumers below (local sums + subtotals) would
  * need a persist barrier to agree. `bucket = #(boundaries <= order)` is
  * monotone in the order column, which is all phase 3 needs.
  *
  * Requirements: `orderCol` is numeric, non-null, and unique within each
  * group (ties would make any running sum order-ambiguous); group columns
  * are non-null.
  */
object PrefixSum {

  /** Running sum of `valueCol` over rows ordered by `orderCol` within each
    * `groupCols` group, emitted as column `out` (inclusive of the current
    * row). Extra shuffles vs the naive window: one tiny aggregate; the data
    * itself is shuffled exactly once, on (bucket, group).
    *
    * @param buckets number of quantile buckets; defaults to
    *                spark.sql.shuffle.partitions
    */
  /** @param tieCols secondary in-bucket sort keys after `orderCol` —
    *                 rows EQUAL on `orderCol` always share a bucket (the
    *                 bucket id is a function of `orderCol` alone), so
    *                 tie-breaking inside the bucket window makes the
    *                 whole prefix order a deterministic total order over
    *                 (orderCol, tieCols) with zero extra shuffles. */
  def groupedRunningSum(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      valueCol: String,
      out: String,
      buckets: Int = 0,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "groupedRunningSum needs at least one group column")
    val b = if (buckets > 0) buckets
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds =
      if (b < 2) Array.empty[Double] // single bucket: degenerate but valid
      else df.stat
        .approxQuantile(orderCol, (1 until b).map(_.toDouble / b).toArray, 1.0 / (10.0 * b))
        .distinct.sorted
    // monotone map-only bucket id: how many boundaries are <= this row's key
    val bucket =
      if (bounds.isEmpty) lit(0)
      else aggregate(array(bounds.toIndexedSeq.map(lit): _*), lit(0),
        (acc, bd) => acc + when(col(orderCol).cast("double") >= bd, 1).otherwise(0))
    val withB = df.withColumn("__psb", bucket)
    val keys = "__psb" +: groupCols

    val localW = Window.partitionBy(keys.map(col): _*)
      .orderBy((orderCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withB.withColumn("__ps_local", sum(col(valueCol)).over(localW))

    // B × |groups| rows — safe to window globally per group and broadcast
    val subs = withB.groupBy(keys.map(col): _*).agg(sum(col(valueCol)).as("__ps_sub"))
    val offW = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__psb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = subs
      .withColumn("__ps_off", coalesce(sum(col("__ps_sub")).over(offW), lit(0L)))
      .drop("__ps_sub")

    local.join(broadcast(offs), keys, "left")
      .withColumn(out, col("__ps_local") + coalesce(col("__ps_off"), lit(0L)))
      .drop("__psb", "__ps_local", "__ps_off")
  }
}
