package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with the
  * same key and `rightTime <= leftTime`.
  *
  * Spark has no built-in as-of join; rather than a custom physical
  * operator, this composes existing ones in the scalable shape: union both
  * sides, ONE shuffle on the key, sort within partitions by (time, side),
  * and carry right-side values forward with `last(..., ignoreNulls)` over
  * an unbounded-preceding window. Right-side ties on time resolve to the
  * row with the greatest `rightTieBreak` (deterministic).
  *
  * This is how a 100 TB event-enrichment runs: no per-row lookups, no
  * broadcast of the big side, linear in both inputs after a single
  * co-partitioning exchange.
  */
object AsOfJoin {
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightValueCols: Seq[String],
           rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // name-collision guards: a right value column shadowing a left column
    // would silently null the left's data and then fail with an ambiguous
    // reference deep in the plan; internal columns likewise
    val collisions = leftCols.toSet intersect rightValueCols.toSet
    require(collisions.isEmpty,
      s"rightValueCols collide with left columns: ${collisions.mkString(",")} — alias one side first")
    val reserved = Seq("__key", "__time", "__side", "__tie", "__rv")
    require(!leftCols.exists(reserved.contains) && !right.columns.exists(reserved.contains),
      s"column names ${reserved.mkString("/")} are reserved by asOf")
    // the tiebreak keeps its native type — casting to long would truncate
    // timestamps to seconds and null-out string tiebreaks, making tie
    // resolution lossy or nondeterministic
    val tieType = right.schema(rightTieBreak).dataType
    // side ordering: right rows (0) sort before left rows (1) at equal
    // time → a right row AT the left row's timestamp is visible (<=)
    val l = left
      .withColumn("__key", col(leftKey)).withColumn("__time", col(leftTime))
      .withColumn("__side", lit(1)).withColumn("__tie", lit(null).cast(tieType))
    val lPadded = rightValueCols.foldLeft(l)((d, c) =>
      d.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r0 = right
      .withColumn("__key", col(rightKey)).withColumn("__time", col(rightTime))
      .withColumn("__side", lit(0)).withColumn("__tie", col(rightTieBreak))
    val rPadded = leftCols.foldLeft(r0)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((leftCols ++ Seq("__key", "__time", "__side", "__tie") ++ rightValueCols).map(col): _*)
    val unioned = lPadded
      .select((leftCols ++ Seq("__key", "__time", "__side", "__tie") ++ rightValueCols).map(col): _*)
      .unionByName(rPadded)
    // carry ALL right values as ONE struct: a right row's struct is never
    // null (even when individual fields are), so `last(..., ignoreNulls)`
    // always takes every column from the SAME most-recent right row —
    // per-column fills would silently stitch together different right rows
    // whenever a value column is legitimately null
    val packed = unioned.withColumn("__rv",
      when(col("__side") === 0, struct(rightValueCols.map(col): _*)))
    val w = Window.partitionBy("__key")
      .orderBy(col("__time").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = packed.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    filled.where(col("__side") === 1)
      .select(leftCols.map(col) ++ rightValueCols.map(c => col(s"__rv.$c").as(c)): _*)
  }
}
