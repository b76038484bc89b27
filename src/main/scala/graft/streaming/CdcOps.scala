package graft.streaming

import graft.expr._
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** CDC retraction support for streaming aggregation — the answer to the
  * reference's delete cascade in streaming mode (SURVEY.md §7.4 item 1).
  *
  * The reference deletes rows from a source table and cascades
  * `Delete(_sourceEntryId)` into every derived table, re-aggregating the
  * group (reference: transform_hook.rs:56-64, database.rs:197-270).
  * Structured Streaming has no retractions, so deletes travel as data: an
  * `_op` envelope column (`insert` | `delete`) flows through the narrow
  * transforms, and this operator folds each row's contribution with sign
  * +1/−1 into per-group state — a deletion exactly undoes the insertion
  * it retracts, and the group upserts its corrected row downstream.
  *
  * Statements use the same memo grammar as batch aggregation
  * (`cnt ~ memo.cnt + 1`, `sum ~ memo.sum + grade`,
  * `avg ~ memo.sum / memo.cnt`); accumulator state is Double (exact for
  * counts and for integer sums below 2^53), and outputs are cast back to
  * the statement's inferred type.
  *
  * Contract: a delete must retract a previously inserted row — the fold is
  * blind arithmetic, so retracting a never-inserted row drives the group
  * negative (the reference would no-op; producers own envelope validity).
  * `_op` values other than insert|delete raise an error (silently counting
  * an "update" as an insert would corrupt aggregates).
  *
  * Output carries its own `_op` column: `upsert` for live groups, `delete`
  * for a group whose last row was retracted — that group's state is freed
  * and the marker row lets downstream stages chain the retraction (the
  * reference's cascade removes the derived group row, database.rs:197-270).
  */
object CdcOps {
  val OpColumn = "_op"

  def aggregateWithRetraction(df: DataFrame, aggregatedColumn: String,
                              statements: Seq[String]): DataFrame = {
    import ExprCompiler._
    graft.expr.GraftFunctions.register(df.sparkSession)
    require(df.columns.contains(OpColumn), s"input must carry an $OpColumn envelope column")
    val schema = df.schema
    val rowResolver = schemaResolver(schema)
    val parsed = statements.map(ExprParser.parseAssignment)

    // accumulations: `dest ~ memo.dest ± term` → signed per-row contribution
    val accs = scala.collection.mutable.LinkedHashMap.empty[String, (Typed, Int)]
    parsed.foreach { case Assignment(dest, e) =>
      e match {
        case GExpr.BinOp("+", GExpr.MemoRef(d), sub) if d == dest && !GExpr.hasMemo(sub) =>
          accs(dest) = (compile(sub, rowResolver), 1)
        // commutative form: `dest ~ term + memo.dest`
        case GExpr.BinOp("+", sub, GExpr.MemoRef(d)) if d == dest && !GExpr.hasMemo(sub) =>
          accs(dest) = (compile(sub, rowResolver), 1)
        case GExpr.BinOp("-", GExpr.MemoRef(d), sub) if d == dest && !GExpr.hasMemo(sub) =>
          accs(dest) = (compile(sub, rowResolver), -1)
        case _ if !GExpr.hasMemo(e) =>
          throw ExprTypeException(s"CDC aggregation requires memo accumulations; got $dest ~ $e")
        case _ => // memo-only → post-aggregation
      }
    }
    if (accs.isEmpty)
      throw ExprTypeException(
        "CDC aggregation needs at least one accumulating statement " +
          s"(`dest ~ memo.dest ± rowExpr`); got: ${statements.mkString("; ")}")
    val accList = accs.toList
    val n = accList.length
    // strict envelope validation: anything but insert|delete fails loudly —
    // a Debezium-style "u"/"c"/"d" feed silently treated as inserts would
    // double-count updates forever
    val sign = when(col(OpColumn) === "delete", lit(-1.0))
      .when(col(OpColumn) === "insert", lit(1.0))
      .otherwise(raise_error(concat(lit(s"unknown $OpColumn value: "), col(OpColumn)))
        .cast(DoubleType))
    // null-safe: a null accumulated value contributes 0, matching the
    // batch path where sum() skips nulls — an unguarded null here would
    // kill the stream in the Seq[Double] deserializer
    val contribs = array(
      // slot 0: live-row count (+1/-1 regardless of statements) — drives
      // ghost-group removal below
      sign +: accList.map { case (_, (t, s)) =>
        (coalesce(t.col.cast(DoubleType), lit(0.0)) * sign * lit(s.toDouble))
      }: _*)

    val keyType = schema(aggregatedColumn).dataType
    val session = df.sparkSession
    import session.implicits._
    val enc = implicitly[org.apache.spark.sql.Encoder[(String, Seq[Double])]]
    val keyed = df
      .select(col(aggregatedColumn).cast(StringType).as("_1"), contribs.as("_2"))
      .as[(String, Seq[Double])]

    val folded = keyed.groupByKey(_._1)(Encoders.STRING)
      .mapGroupsWithState[Array[Double], (String, Seq[Double])](GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Array[Double]]) =>
          val acc = state.getOption.getOrElse(Array.fill(n + 1)(0.0))
          rows.foreach { case (_, cs) =>
            var i = 0
            while (i <= n) { acc(i) += cs(i); i += 1 }
          }
          // a fully-retracted group frees its state (no leak under
          // NoTimeout) and emits one final row marked for deletion — the
          // reference's delete cascade removes the derived group row
          // (database.rs:197-270); the _op column lets a downstream CDC
          // stage chain the retraction
          if (acc(0) == 0.0) state.remove() else state.update(acc)
          (key, acc.toSeq)
      }(Encoders.kryo[Array[Double]], enc)

    val base = folded.toDF("__k", "__acc")
      .select(col("__k").cast(keyType).as(graft.operators.SystemColumns.AggregationKey) +:
        when(col("__acc")(0) === 0.0, lit("delete")).otherwise(lit("upsert")).as(OpColumn) +:
        accList.zipWithIndex.map { case ((dest, (t, _)), i) =>
          col("__acc")(i + 1).cast(sparkTypeOf(t.t)).as(dest)
        }: _*)

    // memo-only post-aggregation statements over the folded columns; like
    // the batch path, later post statements may reference earlier post
    // destinations (the env accumulates as statements compile)
    val typesByDest = scala.collection.mutable.Map.empty[String, ExprCompiler.GType] ++=
      accList.map { case (d, (t, _)) => d -> t.t }
    val memoResolver: Resolver = name => typesByDest.get(name) match {
      case Some(t) => Typed(col(name), t)
      case None    => throw ExprTypeException(s"memo.$name not defined")
    }
    val postCols = parsed.map { case Assignment(dest, e) =>
      if (accs.contains(dest)) col(dest)
      else {
        val t = compile(e, memoResolver, memoResolver)
        typesByDest(dest) = t.t
        // delete markers carry zeroed accumulators — post arithmetic over
        // them (e.g. sum/cnt) would divide by zero under ANSI; CASE
        // short-circuits, so the marker row just nulls its post columns
        when(col(OpColumn) === "delete", lit(null).cast(sparkTypeOf(t.t)))
          .otherwise(t.col).as(dest)
      }
    }
    base.select(col(graft.operators.SystemColumns.AggregationKey) +: col(OpColumn) +: postCols: _*)
  }

  private def sparkTypeOf(t: ExprCompiler.GType): DataType = t match {
    case ExprCompiler.GInt    => LongType
    case ExprCompiler.GDec    => ExprCompiler.refDecimal
    case ExprCompiler.GDouble => DoubleType
    case ExprCompiler.GStr    => StringType
    case ExprCompiler.GBool   => BooleanType
    case ExprCompiler.GOther(dt) => dt
  }
}
