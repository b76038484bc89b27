package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) data layout — the multi-dimensional
  * data-skipping primitive: interleaving the bits of two clustering
  * dimensions makes rows that are close in BOTH dimensions close on the
  * curve, so files cut from the sorted curve cover small (x, y)
  * RECTANGLES instead of thin full-height stripes. At 100 TB the payoff
  * is at the scan: per-file min/max statistics (parquet footers, table-
  * format manifests) prune a two-predicate query to the few files whose
  * rectangle intersects it, where a single-column sort prunes only on
  * that column and reads everything for predicates on the other.
  *
  * The z-value is a SUM OF DISJOINT BIT TERMS (bit i of x at position
  * 2i+1, bit i of y at 2i), so plain integer addition reproduces it on
  * any engine — the oracle computes the identical curve.
  *
  * File assignment here is by FIXED z-range cut (`z div
  * 2^(2·bits − log2 nFiles)`): map-only, deterministic, and
  * oracle-replicable. A production writer would range-partition by
  * sampled z-quantiles to equalize file SIZES (Spark's
  * `repartitionByRange(z)` — boundaries are sampled, hence not
  * engine-reproducible); the fixed cut is the deterministic analog and
  * yields the same locality, with row-count skew tracking the key
  * distribution's density in z-space (reported per file, so the skew is
  * visible, not hidden).
  */
object ZOrder {

  /** Morton z-value of the low `bits` bits of `x` and `y` (x in odd bit
    * positions, y in even). Inputs outside [0, 2^bits) must be reduced
    * by the caller (`pmod`) — bucketized dimensions are the normal
    * z-order input.
    *
    * This is the PORTABLE lambda formulation (the oracle mirror and the
    * NativeKernelSpec pin); [[layoutStats]] evaluates the identical math
    * through the codegen'd [[graft.expr.ZValue]] kernel — one primitive
    * loop instead of a per-row interpreted fold over a sequence array. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, i) =>
      acc
        + call_function("shiftleft",
            call_function("shiftright", x.cast("long"), i).bitwiseAND(lit(1L)),
            i * 2 + 1)
        + call_function("shiftleft",
            call_function("shiftright", y.cast("long"), i).bitwiseAND(lit(1L)),
            i * 2))
  }

  /** Per-file layout statistics under a z-order cut: assign each row to
    * `file = z div 2^(2·bits − log2 nFiles)` and report each non-empty
    * file's row count and PER-DIMENSION min/max + span (basis points of
    * the domain). Per-dimension spans are the data-skipping quantity: by
    * pigeonhole every balanced layout's files cover ~1/nFiles of the
    * (x, y) AREA, but a z-order file is a small rectangle (both spans ≈
    * domain/4^(log4 nFiles/…)) where a single-column sort's files are
    * thin full-height stripes (span_y = the whole domain) — so a
    * predicate on the OTHER dimension prunes z-order files and reads
    * every stripe. ONE map pass + ONE file-keyed aggregate; nothing
    * global, nothing sorted.
    *
    * @param nFiles power of two ≤ 4^bits
    */
  def layoutStats(df: DataFrame, xCol: String, yCol: String,
                  bits: Int = 16, nFiles: Int = 64): DataFrame = {
    require(nFiles >= 2 && (nFiles & (nFiles - 1)) == 0,
      s"nFiles must be a power of two >= 2, got $nFiles")
    val logF = 31 - Integer.numberOfLeadingZeros(nFiles)
    require(2 * bits - logF >= 0, s"nFiles $nFiles too large for $bits-bit dims")
    graft.expr.GraftFunctions.register(df.sparkSession)
    val x = pmod(col(xCol).cast("long"), lit(1L << bits))
    val y = pmod(col(yCol).cast("long"), lit(1L << bits))
    val z = call_function("z_value", x, y, lit(bits))
    df.select(
        call_function("shiftright", z, lit(2 * bits - logF)).as("file_id"),
        x.as("__x"), y.as("__y"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("__x").as("min_x"), max("__x").as("max_x"),
        min("__y").as("min_y"), max("__y").as("max_y"))
      .select(col("file_id"), col("n_rows"),
        col("min_x"), col("max_x"), col("min_y"), col("max_y"),
        expr(s"(max_x - min_x + 1) * 10000 div ${1L << bits}").as("span_x_bp"),
        expr(s"(max_y - min_y + 1) * 10000 div ${1L << bits}").as("span_y_bp"))
  }
}
