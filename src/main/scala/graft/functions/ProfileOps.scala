package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus profiling at two fidelities: exact (oracle-verifiable, used by
  * q35/q36) and sketched (the 100 TB path — HyperLogLog++ cardinalities
  * and KLL-style quantiles in fixed memory, one pass, mergeable across
  * partitions). At scale the exact variants are the wrong tool: exact
  * distinct shuffles every value and exact percentile sorts the column;
  * the sketches are O(1) memory per group and merge map-side.
  */
object ProfileOps {

  /** Exact per-group distinct + count profile (q35's shape). */
  def distinctProfile(df: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(countDistinct(col(idCol)).as("n_distinct"), count(lit(1)).as("n_rows"))

  /** Sketched profile: HLL++ distinct (rsd-bounded) — the same answer
    * shape as [[distinctProfile]] in fixed memory per group. */
  def approxDistinctProfile(df: DataFrame, groupCol: String, idCol: String,
                            rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCol)
      .agg(approx_count_distinct(col(idCol), rsd).as("n_distinct"),
        count(lit(1)).as("n_rows"))

  /** Sketched per-group quantiles (KLL-style, `accuracy` controls error). */
  def approxPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                        percentiles: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val pArr = array(percentiles.map(lit): _*)
    df.groupBy(groupCol)
      .agg(percentile_approx(col(valueCol), pArr, lit(accuracy)).as("p"))
  }
}
