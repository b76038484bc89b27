package graft.operators

import graft.expr._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** System columns (reference: reactive_db/src/constants.rs:2-5). */
object SystemColumns {
  val EntryId = "_entryId"
  val SourceEntryId = "_sourceEntryId"
  val MatchingKey = "matchingKey"
  val AggregationKey = "aggregatedColumn"
}

/** Batch semantics of the reference's five transform kinds, each expressed
  * as a pure DataFrame→DataFrame function so Catalyst sees one logical plan
  * per derived table (reference dispatch:
  * reactive_db/src/hooks/transforms/transform.rs:22-126).
  *
  * Scale notes: Function/Filter/Action are narrow (no shuffle); Aggregation
  * is a hash aggregate with map-side partial aggregation; Union is an n-way
  * outer join on the matching key — co-partitioned on that key, and
  * broadcast when a side is small (AQE decides at runtime).
  */
object Transforms {
  import SystemColumns._

  /** FunctionTransform: output = computed columns only + lineage
    * (reference: transform.rs:128-148). `carry` names envelope columns
    * (e.g. a CDC `_op`) passed through untouched when present. */
  def function(input: DataFrame, assignments: Seq[String],
               carry: Seq[String] = Nil): DataFrame = {
    graft.expr.GraftFunctions.register(input.sparkSession)
    val schema = input.schema
    val cols = assignments.map { s =>
      val (dest, c) = ExprCompiler.compileAssignment(s, schema)
      c.as(dest)
    }
    val lineage =
      if (schema.fieldNames.contains(EntryId)) Seq(col(EntryId).as(SourceEntryId)) else Nil
    val carried = carry.filter(schema.fieldNames.contains).map(col)
    input.select(cols ++ lineage ++ carried: _*)
  }

  /** FilterTransform: passing rows keep ALL source columns + lineage
    * (reference: transform.rs:150-174). */
  def filter(input: DataFrame, predicate: String): DataFrame = {
    graft.expr.GraftFunctions.register(input.sparkSession)
    val typed = ExprCompiler.compile(
      ExprParser.parse(predicate), ExprCompiler.schemaResolver(input.schema))
    require(typed.t == ExprCompiler.GBool, s"filter must be boolean, got ${typed.t}")
    val filtered = input.filter(typed.col)
    if (input.schema.fieldNames.contains(EntryId))
      filtered.withColumn(SourceEntryId, col(EntryId))
    else filtered
  }

  /** UnionTransform: n-way key-coalescing outer merge — each input's
    * foreign key becomes `matchingKey`; one output row per key with
    * later inputs' columns overwriting earlier ones on overlap
    * (reference: transform.rs:176-228; batch rendition of the row-at-a-time
    * upsert). Inputs are expected key-unique (pre-reduce upstream if not).
    *
    * Plan shape: a chain of full_outer joins on the same key — Catalyst
    * keeps the hash-partitioning on matchingKey across the chain so only
    * the first join shuffles each input once.
    */
  def union(inputs: Seq[(DataFrame, String)]): DataFrame = {
    require(inputs.nonEmpty, "union needs at least one input")
    val renamed = inputs.map { case (df, fk) =>
      val dropped = Seq(EntryId, SourceEntryId).filter(df.columns.contains)
      df.drop(dropped: _*).withColumnRenamed(fk, MatchingKey)
    }
    renamed.reduce { (left, right) =>
      val overlap = (left.columns.toSet intersect right.columns.toSet) - MatchingKey
      val l = overlap.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"__l_$c"))
      val joined = l.join(right, Seq(MatchingKey), "full_outer")
      // incoming (right/later) overwrites existing (left/earlier)
      val merged = overlap.foldLeft(joined) { (d, c) =>
        d.withColumn(c, coalesce(col(c), col(s"__l_$c"))).drop(s"__l_$c")
      }
      merged
    }
  }

  /** AggregationTransform: per-group memo fold → decomposed into Spark
    * aggregates (reference: transform.rs:229-275). Recognized statement
    * shapes, applied in order with the memo environment threaded through:
    *
    *   - `dest ~ memo.dest + rowExpr` → sum(rowExpr)   (count = sum(1))
    *   - `dest ~ memo.dest - rowExpr` → -sum(rowExpr)
    *   - memo-only expressions        → post-aggregation arithmetic over
    *     previously computed dests (e.g. `average ~ memo.sum / memo.count`)
    *
    * This turns the reference's O(group) re-read per insert into a single
    * distributed hash aggregate with map-side combine.
    */
  def aggregation(input: DataFrame, aggregatedColumn: String, statements: Seq[String]): DataFrame = {
    graft.expr.GraftFunctions.register(input.sparkSession)
    import ExprCompiler._
    val schema = input.schema
    val rowResolver = schemaResolver(schema)
    val parsed = statements.map(ExprParser.parseAssignment)

    // first pass: accumulation aggregates (`dest ~ memo.dest ± term`, term
    // memo-free — covers count via `memo.cnt + 1` and sum via
    // `memo.sum + col`); memo-only statements are deferred to pass two.
    val aggExprs = scala.collection.mutable.LinkedHashMap.empty[String, Typed]
    parsed.foreach { case Assignment(dest, e) =>
      e match {
        case GExpr.BinOp("+", GExpr.MemoRef(d), sub) if d == dest && !GExpr.hasMemo(sub) =>
          val t = compile(sub, rowResolver)
          aggExprs(dest) = Typed(coalesce(sum(t.col), lit(0)).cast(sparkType(t.t)), t.t)
        // commutative form: `dest ~ term + memo.dest`
        case GExpr.BinOp("+", sub, GExpr.MemoRef(d)) if d == dest && !GExpr.hasMemo(sub) =>
          val t = compile(sub, rowResolver)
          aggExprs(dest) = Typed(coalesce(sum(t.col), lit(0)).cast(sparkType(t.t)), t.t)
        case GExpr.BinOp("-", GExpr.MemoRef(d), sub) if d == dest && !GExpr.hasMemo(sub) =>
          val t = compile(sub, rowResolver)
          aggExprs(dest) = Typed((lit(0) - coalesce(sum(t.col), lit(0))).cast(sparkType(t.t)), t.t)
        case _ if !GExpr.hasMemo(e) =>
          // per-row overwrite: the reference's last-row-wins collapses to an
          // arbitrary representative; `first` for determinism within a task
          val t = compile(e, rowResolver)
          aggExprs(dest) = Typed(first(t.col), t.t)
        case _ if GExpr.hasColRef(e) =>
          throw ExprTypeException(
            s"unsupported memo accumulation for $dest: only `dest ~ memo.dest ± rowExpr` " +
              "folds decompose into distributed aggregates — use aggregationFold for " +
              "general order-dependent memo folds")
        case _ => // memo-only → post-aggregation pass
      }
    }

    if (aggExprs.isEmpty)
      throw ExprTypeException(
        "aggregation needs at least one accumulating statement " +
          "(`dest ~ memo.dest ± rowExpr` or a row expression); " +
          s"got only memo-only statements: ${statements.mkString("; ")}")

    val grouped = input
      .groupBy(col(aggregatedColumn).as(AggregationKey))
      .agg(aggExprs.head._2.col.as(aggExprs.head._1),
           aggExprs.tail.map { case (d, t) => t.col.as(d) }.toSeq: _*)

    // second pass: memo-only post-aggregation statements
    val memoResolver: Resolver = { name =>
      aggExprs.get(name) match {
        case Some(t) => Typed(col(name), t.t)
        case None    => throw ExprTypeException(s"memo.$name not yet defined")
      }
    }
    val postCols = parsed.map { case Assignment(dest, e) =>
      if (aggExprs.contains(dest)) col(dest)
      else {
        val t = compile(e, memoResolver, memoResolver)
        aggExprs(dest) = Typed(col(dest), t.t)
        t.col.as(dest)
      }
    }
    grouped.select(col(AggregationKey) +: postCols: _*)
  }

  /** General memo fold for statements that do NOT decompose into Spark
    * aggregates (e.g. `x ~ memo.x * col` — the reference accepts ANY fold,
    * transform.rs:244-271): per group, rows are collected, sorted by
    * `orderColumn`, and folded sequentially with the reference's clean
    * semantics — memo values initialize to Integer(0) and each statement
    * sees the latest memo environment (earlier statements' results from
    * the SAME row, SURVEY.md §7.5 documents the first-row double-eval
    * quirk we deliberately do not replicate).
    *
    * Scale contract: one group must fit in executor memory (the reference
    * re-reads the whole group per insert, so this is strictly no worse);
    * decomposable folds should use [[aggregation]], which stays a hash
    * aggregate with map-side combine.
    */
  def aggregationFold(input: DataFrame, aggregatedColumn: String,
                      statements: Seq[String], orderColumn: String): DataFrame = {
    graft.expr.GraftFunctions.register(input.sparkSession)
    import ExprCompiler._
    val schema = input.schema
    require(schema.fieldNames.contains(orderColumn),
      s"aggregationFold order column $orderColumn is not an input column")
    val parsed = statements.map(ExprParser.parseAssignment)
    val dests = parsed.map(_.dest).distinct
    val needed = orderColumn +:
      (parsed.flatMap(a => GExpr.collectCols(a.expr)).toSet - orderColumn).toSeq
        .filter(schema.fieldNames.contains).sorted // order column first → array_sort key

    // memo types: start at the reference's Integer(0) init and iterate to
    // the promotion fixpoint. Promotion is monotone (Int → Decimal/Double)
    // but propagates only one statement per pass through backward
    // memo-reference chains, so iterate up to |dests|+1 passes and stop
    // when stable.
    var memoTypes: Map[String, GType] = dests.map(_ -> (GInt: GType)).toMap
    var stable = false
    var pass = 0
    while (!stable && pass <= dests.size) {
      val typeEnv = scala.collection.mutable.Map.empty[String, GType] ++= memoTypes
      parsed.foreach { case Assignment(dest, e) =>
        val rowRes: Resolver = n => schemaResolver(schema)(n)
        val memoRes: Resolver = d => Typed(lit(0).cast(sparkType(typeEnv.getOrElse(d,
          throw ExprTypeException(s"memo.$d not yet defined")))), typeEnv(d))
        typeEnv(dest) = compile(e, rowRes, memoRes).t
      }
      stable = typeEnv.toMap == memoTypes
      memoTypes = typeEnv.toMap
      pass += 1
    }

    val rowsCol = array_sort(collect_list(struct(needed.map(col): _*)))
    val init = struct(dests.map(d => lit(0).cast(sparkType(memoTypes(d))).as(d)): _*)
    val folded = aggregate(rowsCol, init, (acc, x) => {
      val env = scala.collection.mutable.LinkedHashMap.empty[String, Typed] ++=
        dests.map(d => d -> Typed(acc.getField(d), memoTypes(d)))
      parsed.foreach { case Assignment(dest, e) =>
        val rowRes: Resolver = n =>
          if (needed.contains(n)) Typed(x.getField(n), toGType(schema(n).dataType))
          else throw ExprTypeException(s"No such column $n exists")
        val memoRes: Resolver = d => env.getOrElse(d,
          throw ExprTypeException(s"memo.$d not yet defined"))
        val t = compile(e, rowRes, memoRes)
        env(dest) = Typed(t.col.cast(sparkType(memoTypes(dest))), memoTypes(dest))
      }
      struct(dests.map(d => env(d).col.as(d)): _*)
    })
    input.groupBy(col(aggregatedColumn).as(AggregationKey))
      .agg(folded.as("__m"))
      .select(col(AggregationKey) +: dests.map(d => col(s"__m.$d").as(d)): _*)
  }

  private def sparkType(t: ExprCompiler.GType): DataType = t match {
    case ExprCompiler.GInt    => LongType
    case ExprCompiler.GDec    => ExprCompiler.refDecimal
    case ExprCompiler.GDouble => DoubleType
    case ExprCompiler.GStr    => StringType
    case ExprCompiler.GBool   => BooleanType
    case ExprCompiler.GOther(dt) => dt
  }

  /** ActionTransform: named row→row function from the registry, applied
    * distributed via mapPartitions (reference: transform.rs:104-124 runs an
    * embedded Python function; our Scala-native analog is a typed registry —
    * SURVEY.md §2.7). Rows that throw are dropped with a warning, matching
    * the reference's error-drops-row behavior. */
  def action(input: DataFrame, act: GraftAction): DataFrame = {
    val outSchema0 = act.outputSchema(input.schema)
    val hasEntry = input.schema.fieldNames.contains(EntryId)
    val outSchema =
      if (hasEntry && !outSchema0.fieldNames.contains(SourceEntryId))
        outSchema0.add(SourceEntryId, StringType)
      else outSchema0
    val fn = act.fn
    val inSchema = input.schema
    val mapped = input.mapPartitions { it =>
      it.flatMap { row =>
        try {
          val out = fn(row)
          if (hasEntry) {
            val src = row.getAs[Any](inSchema.fieldIndex(SystemColumns.EntryId))
            Some(Row.fromSeq(out.toSeq :+ src))
          } else Some(out)
        } catch {
          case e: Exception =>
            System.err.println(s"[graft] action ${act.name} dropped row: ${e.getMessage}")
            None
        }
      }
    }(Encoders.row(outSchema))
    mapped.toDF()
  }
}

/** A registered row→row user function (the reference's Action mechanism,
  * reference: reactive_db/src/actions/action.rs:29-48). */
final case class GraftAction(
    name: String,
    fn: Row => Row,
    outputSchema: StructType => StructType = identity)

/** Process-wide action registry, the analog of the reference's
  * action_config workspace (reference: config_reader.rs:63-79). */
object ActionRegistry {
  private val actions = scala.collection.concurrent.TrieMap.empty[String, GraftAction]
  def register(a: GraftAction): Unit = actions.put(a.name, a)
  def get(name: String): GraftAction =
    actions.getOrElse(name, throw new NoSuchElementException(s"no action named $name"))
  def clear(): Unit = actions.clear()
}
