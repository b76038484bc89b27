package graft.streaming

import graft.ListenEvent
import graft.config._
import graft.operators.{SystemColumns, Transforms}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured-Streaming rendition of the reference's reactive cascade
  * (SURVEY.md §2.6): source tables are streams, each derived table is a
  * streaming DataFrame, and [[ListenBus]] subscribers receive per-batch
  * Insert/Delete events — the micro-batch analog of the reference's
  * per-commit push (reference: reactive_db/src/hooks/listener_hook.rs:56-87).
  *
  *   - Function / Filter → append-mode narrow transforms
  *   - Aggregation       → update-mode streaming aggregate (upsert per
  *     group — exactly the reference's per-group upsert visibility)
  *   - Union             → mapGroupsWithState keyed on matchingKey
  *     holding the merged row (update upsert)
  *
  * With `cdc = true` the pipeline also cascades DELETES, the reference's
  * PostDelete hook path (transform_hook.rs:56-64): every source row travels
  * with an `_op` envelope (`insert` | `delete`), narrow transforms carry it
  * through, unions become provenance-tracked upserts that emit
  * Delete(old)+Insert(new) pairs, and aggregations fold retractions via
  * [[CdcOps.aggregateWithRetraction]] — so a [[delete]] on a source
  * corrects every derived table downstream, without reprocessing history.
  *
  * Update events surface as Delete(old)+Insert(new) pairs, matching the
  * reference's Update ≡ delete-then-insert (database.rs:282-286),
  * synthesized from per-key state in [[listen]]. [[listenBus]] subscribers
  * are fed by ONE dedicated internal query per table, started lazily on the
  * first subscription — delivery is exactly-once per micro-batch regardless
  * of how many (or zero) independent [[listen]] queries exist.
  */
final class StreamingPipeline(val spark: SparkSession, val config: PipelineConfig,
                              val cdc: Boolean = false) {
  import SystemColumns._
  import CdcOps.OpColumn

  /** Driver-side guard for the listen hand-off: a micro-batch larger than
    * this aborts the feed query instead of silently buffering the cluster's
    * output on the driver (the reference also funnels every listener
    * through one thread — db_thread.rs — but its tables are single-node to
    * begin with). Listeners on corpus-scale tables should aggregate
    * upstream or raise this knowingly. */
  @volatile var listenMaxBatchRows: Int = 1 << 20

  /** Monotonic enqueue sequence, hex-prefixed into `_entryId` so a group's
    * rows can be re-ordered to COMMIT order after the shuffle (the batch
    * side prefixes epoch-micros the same way, PipelineGraph.ensureEntryId).
    * flatMapGroupsWithState gives no intra-group ordering guarantee: an
    * insert and a delete for the same key landing in one micro-batch could
    * otherwise apply in reverse, nondeterministically resurrecting the row. */
  private val enqueueSeq = new java.util.concurrent.atomic.AtomicLong()

  private val memStreams = scala.collection.mutable.Map.empty[String, MemoryStream[Row]]
  private val frames = scala.collection.mutable.Map.empty[String, DataFrame]
  private val busFeeds = scala.collection.mutable.Map.empty[String, StreamingQuery]
  val listenBus: ListenBus = new ListenBus(
    validate = table => require(frames.contains(table), s"no table named $table"),
    // synchronized: TrieMap.getOrElseUpdate evaluates its thunk outside
    // any lock, so two concurrent first-subscribes would start TWO feed
    // queries and orphan one (publishing every batch twice, unstoppable
    // by close())
    ensureFeed = (table, keyColumns) => busFeeds.synchronized {
      busFeeds.getOrElseUpdate(table,
        startQuery(table, keyColumns)((ins, del) => listenBus.publish(table, ins, del)))
    })

  config.topoOrder.foreach {
    case s: SourceTableConfig =>
      val valueFields = s.columns.map { case (n, t) => StructField(n, t) } :+
        StructField(EntryId, StringType)
      val schema = StructType(
        if (cdc) valueFields :+ StructField(OpColumn, StringType) else valueFields)
      implicit val sqlCtx = spark.sqlContext
      implicit val enc = Encoders.row(schema)
      val ms = MemoryStream[Row]
      memStreams(s.name) = ms
      frames(s.name) = ms.toDF()
    case f: FunctionTableConfig =>
      rejectCdcAggSource(f.name, f.sourceTable, "function")
      frames(f.name) = Transforms.function(frames(f.sourceTable), f.functions,
        carry = if (cdc) Seq(OpColumn) else Nil)
    case f: FilterTableConfig =>
      // filter keeps all columns, so the _op envelope passes through; a
      // delete row carries the same values as the insert it retracts and
      // therefore takes the same branch of the predicate. That argument
      // holds ONLY for source/union changelogs — see rejectCdcAggSource.
      rejectCdcAggSource(f.name, f.sourceTable, "filter")
      frames(f.name) = Transforms.filter(frames(f.sourceTable), f.filter)
    case a: AggregationTableConfig =>
      frames(a.name) =
        if (cdc) CdcOps.aggregateWithRetraction(frames(a.sourceTable), a.aggregatedColumn, a.functions)
        else Transforms.aggregation(frames(a.sourceTable), a.aggregatedColumn, a.functions)
    case u: UnionTableConfig =>
      frames(u.name) = if (cdc) cdcUnion(u) else streamingUnion(u)
    case a: ActionTableConfig =>
      // CDC note: action rows include the _op envelope; the registered
      // row→row function owns envelope handling (it sees and emits whole
      // rows by contract)
      frames(a.name) = Transforms.action(frames(a.sourceTable), graft.operators.ActionRegistry.get(a.actionName))
  }

  /** CDC aggregation outputs are upsert changelogs whose full-retraction
    * markers carry zeroed accumulators and null post columns
    * (CdcOps.aggregateWithRetraction): a downstream filter would evaluate
    * its predicate over those zeros and silently drop the marker (stale row
    * downstream forever), and a downstream function would compute garbage
    * from them. Agg-over-agg already fails loudly (the retracting fold
    * raise_errors on `_op=upsert`); this makes the narrow-stage topologies
    * equally loud, at construction instead of mid-stream. */
  private def rejectCdcAggSource(name: String, source: String, kind: String): Unit =
    if (cdc && config.byName.get(source).exists(_.isInstanceOf[AggregationTableConfig]))
      throw new IllegalArgumentException(
        s"CDC pipeline: $kind table '$name' reads from aggregation '$source', whose " +
          "retraction markers carry zeroed accumulators — a downstream " +
          s"$kind would silently corrupt the cascade. Restructure the plan " +
          s"(apply the $kind before the aggregation, or aggregate last).")

  def table(name: String): DataFrame = frames(name)

  /** Insert rows into a source stream (the analog of InsertData). */
  def insert(table: String, rows: Seq[Row]): Unit = enqueue(table, rows, "insert")

  /** Delete rows from a source stream (the analog of DeleteData,
    * reference: transform_hook.rs:56-64). Each row must carry the same
    * VALUES as the insert it retracts — deletes travel as data through the
    * derived graph, so the narrow transforms recompute the identical
    * derived row and the aggregate retracts exactly. Requires `cdc = true`. */
  def delete(table: String, rows: Seq[Row]): Unit = {
    require(cdc, "delete() needs a CDC pipeline: new StreamingPipeline(spark, config, cdc = true)")
    enqueue(table, rows, "delete")
  }

  private def enqueue(table: String, rows: Seq[Row], op: String): Unit = {
    val ms = memStreams.getOrElse(table,
      throw new IllegalArgumentException(s"$table is not a source table"))
    val withIds = rows.map { r =>
      val id = f"${enqueueSeq.getAndIncrement()}%016x-${java.util.UUID.randomUUID()}"
      val base = r.toSeq :+ id
      Row.fromSeq(if (cdc) base :+ op else base)
    }
    ms.addData(withIds)
  }

  /** Streaming union-merge: rows from every input keyed by the foreign key,
    * merged last-writer-wins into per-key state (the reference's upsert,
    * transform.rs:176-228). Values travel as JSON so heterogeneous input
    * schemas merge without a shared encoder. */
  private def streamingUnion(u: UnionTableConfig): DataFrame = {
    val inputs = u.tablesAndForeignKeys.map { case (tbl, fk) =>
      val df = frames(tbl)
      val dropped = Seq(EntryId, SourceEntryId).filter(df.columns.contains)
      df.drop(dropped: _*).withColumnRenamed(fk, MatchingKey)
    }
    // union output schema: matchingKey + union of value columns (later
    // tables win on type conflicts). NOTE: to_json omits null fields, so
    // an incoming null can never overwrite a previous non-null value —
    // this matches the reference's sparse tagged entries, where null is
    // unrepresentable and absent columns simply don't overwrite.
    val valueFields = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    inputs.foreach(_.schema.fields.foreach(f => if (f.name != MatchingKey) valueFields(f.name) = f))

    val tagged = inputs.map(df =>
      df.select(col(MatchingKey).cast(StringType).as("k"),
        to_json(struct(df.columns.toIndexedSeq.filter(_ != MatchingKey).map(col): _*)).as("v")))
      .reduce(_.unionByName(_))

    implicit val stringTupleEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val outEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    val merged = tagged.as[(String, String)](stringTupleEnc)
      .groupByKey(_._1)(Encoders.STRING)
      .mapGroupsWithState[String, (String, String)](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[String]) =>
          val mapper = CdcUnionState.mapper()
          val acc = new java.util.LinkedHashMap[String, Object]()
          if (state.exists) {
            val prev = mapper.readValue(state.get, classOf[java.util.LinkedHashMap[String, Object]])
            acc.putAll(prev)
          }
          rows.foreach { case (_, json) =>
            val m = mapper.readValue(json, classOf[java.util.LinkedHashMap[String, Object]])
            acc.putAll(m) // incoming overwrites existing (reference semantics)
          }
          val merged = mapper.writeValueAsString(acc)
          state.update(merged)
          (key, merged)
      }(Encoders.STRING, outEnc)
    val keyType = inputs.head.schema(MatchingKey).dataType
    merged.toDF("k", "v")
      .select(col("k").cast(keyType).as(MatchingKey),
        from_json(col("v"), StructType(valueFields.values.map(_.copy(nullable = true)).toSeq)).as("s"))
      .select(col(MatchingKey) +: valueFields.keys.map(n => col(s"s.$n").as(n)).toSeq: _*)
  }

  /** CDC union-merge: like [[streamingUnion]] but provenance-tracked so
    * deletes retract. Per-key state holds each input table's latest row
    * (inputs are key-unique per the union contract, Transforms.union); an
    * insert from input i replaces slot i, a delete clears it. Every net
    * change emits Delete(oldMerged)+Insert(newMerged) — the reference's
    * Update ≡ delete-then-insert encoding (database.rs:282-286) — so a
    * downstream CDC aggregate retracts the old contribution exactly, and a
    * key whose last slot clears emits only the delete (the reference's
    * cascade removes the derived row, transform_hook.rs:56-64).
    *
    * Merge order is INPUT order (later tables' columns win on overlap),
    * matching batch Transforms.union — not the arrival-order LWW of the
    * insert-only streaming union, which is untrackable under retraction. */
  private def cdcUnion(u: UnionTableConfig): DataFrame = {
    // (input df, commit-order column): the enqueue-seq-prefixed entry id
    // survives narrow transforms as _entryId (sources, filters) or
    // _sourceEntryId (functions); groups re-sort on it below because the
    // shuffle destroys enqueue order
    val inputs = u.tablesAndForeignKeys.map { case (tbl, fk) =>
      val df = frames(tbl)
      val seqCol =
        if (df.columns.contains(EntryId)) col(EntryId)
        else if (df.columns.contains(SourceEntryId)) col(SourceEntryId)
        else lit("")
      val dropped = Seq(EntryId, SourceEntryId).filter(df.columns.contains)
      (df.withColumn("__seq", seqCol).drop(dropped: _*).withColumnRenamed(fk, MatchingKey),
        "__seq")
    }
    val valueFields = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    inputs.foreach(_._1.schema.fields.foreach(f =>
      if (f.name != MatchingKey && f.name != OpColumn && f.name != "__seq")
        valueFields(f.name) = f))

    val tagged = inputs.zipWithIndex.map { case ((df, seqName), i) =>
      val valueCols = df.columns.filter(c => c != MatchingKey && c != OpColumn && c != seqName)
      df.select(col(MatchingKey).cast(StringType).as("k"), lit(i).as("src"),
        col(OpColumn).as("op"), to_json(struct(valueCols.map(col): _*)).as("v"),
        col(seqName).cast(StringType).as("seq"))
    }.reduce(_.unionByName(_))

    implicit val inEnc = Encoders.tuple(
      Encoders.STRING, Encoders.scalaInt, Encoders.STRING, Encoders.STRING, Encoders.STRING)
    val outEnc =
      Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING)
    val merged = tagged.as[(String, Int, String, String, String)](inEnc)
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[String, (String, String, String)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Int, String, String, String)], state: GroupState[String]) =>
          val mapper = CdcUnionState.mapper()
          val slots = new java.util.LinkedHashMap[String, String]()
          if (state.exists) {
            val prev = mapper.readValue(state.get, classOf[java.util.LinkedHashMap[String, String]])
            slots.putAll(prev)
          }
          val before = CdcUnionState.mergeSlots(mapper, slots)
          // commit order, not arrival order: the hex seq prefix sorts
          // lexicographically == numerically (fixed width)
          rows.toSeq.sortBy(_._5).foreach { case (_, src, op, v, _) =>
            op match {
              case "insert" => slots.put(src.toString, v)
              case "delete" => slots.remove(src.toString)
              case other => throw new IllegalStateException(
                s"unknown $OpColumn value in union input: $other")
            }
          }
          val after = CdcUnionState.mergeSlots(mapper, slots)
          if (slots.isEmpty) state.remove() else state.update(mapper.writeValueAsString(slots))
          if (before == after) Iterator.empty
          else Option(before).map((key, "delete", _)).iterator ++
            Option(after).map((key, "insert", _)).iterator
      }(Encoders.STRING, outEnc)

    val keyType = inputs.head._1.schema(MatchingKey).dataType
    merged.toDF("k", "op", "v")
      .select(col("k").cast(keyType).as(MatchingKey), col("op").as(OpColumn),
        from_json(col("v"), StructType(valueFields.values.map(_.copy(nullable = true)).toSeq)).as("s"))
      .select(col(MatchingKey) +: col(OpColumn) +:
        valueFields.keys.map(n => col(s"s.$n").as(n)).toSeq: _*)
  }

  /** Does this table's PLAN contain an upsert operator anywhere upstream?
    * Spark picks the output mode for the whole plan, so a Function table
    * downstream of an Aggregation still needs Update mode (Append would
    * be rejected at start() — 'Append output mode not supported when
    * there are streaming aggregations'). */
  private def isUpsertPlan(table: String): Boolean = config.byName.get(table) match {
    case Some(_: AggregationTableConfig) | Some(_: UnionTableConfig) => true
    case Some(d: DerivedTableConfig) => d.inputTables.exists(isUpsertPlan)
    case _ => false
  }

  private val queryCounter = new java.util.concurrent.atomic.AtomicInteger()

  /** Start a listen subscription on a table: the subscriber's callback
    * receives (inserts, deletes) per micro-batch — or only the requested
    * kind with `event = ListenEvent.Insert | Delete` (the reference's
    * per-kind subscriptions, network_types.rs:33-37). Upsert-containing
    * plans run in update mode and synthesize Delete(old)+Insert(new); CDC
    * plans carry explicit `_op` markers instead. Pure narrow plans are
    * append-only (inserts only). Multiple subscribers per table each get
    * their own uniquely-named query, independent of the bus. */
  def listen(table: String, keyColumns: Seq[String] = Nil,
             event: ListenEvent = ListenEvent.Both)
            (callback: (Seq[Row], Seq[Row]) => Unit): StreamingQuery =
    startQuery(table, keyColumns)(ListenBus.filtered(event, callback))

  private def startQuery(table: String, keyColumns: Seq[String])
                        (callback: (Seq[Row], Seq[Row]) => Unit): StreamingQuery = {
    val df = frames(table)
    val isUpsert = isUpsertPlan(table)
    val mode = if (isUpsert) OutputMode.Update() else OutputMode.Append()
    val keyCols: Seq[String] =
      if (keyColumns.nonEmpty) keyColumns
      else config.byName(table) match {
        case _: AggregationTableConfig => Seq(AggregationKey)
        case _: UnionTableConfig       => Seq(MatchingKey)
        case _                         => Nil
      }
    val hasOp = df.columns.contains(OpColumn)
    val prevState = scala.collection.mutable.Map.empty[Seq[Any], Row]
    df.writeStream
      .outputMode(mode)
      .queryName(s"listen_${table}_${queryCounter.incrementAndGet()}")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // bounded hand-off: partitions stream to the driver one at a time
        // (toLocalIterator), and a batch beyond listenMaxBatchRows kills
        // the feed loudly instead of buffering a cluster's output in the
        // driver heap. Read the guard here, per batch — not captured at
        // query start — so raising/lowering it applies to running feeds.
        val maxRows = listenMaxBatchRows
        val it = batch.toLocalIterator()
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (it.hasNext) {
          buf += it.next()
          if (buf.length > maxRows)
            throw new IllegalStateException(
              s"listen micro-batch on '$table' exceeded listenMaxBatchRows=$maxRows; " +
                "aggregate upstream or raise the guard")
        }
        val rows = buf.toSeq
        val schema = batch.schema
        def keyOf(r: Row): Seq[Any] = keyCols.map(k => r.getAs[Any](schema.fieldIndex(k)))
        if (hasOp) {
          // CDC plan: explicit markers. delete rows → deletes (and evict
          // their driver-side key state); upsert rows (CDC aggregates)
          // still synthesize Delete(old) from per-key state; insert rows
          // (CDC unions) arrive pre-paired with their own delete rows.
          val opIdx = schema.fieldIndex(OpColumn)
          val (delRows, liveRows) = rows.partition(_.getString(opIdx) == "delete")
          val dels = scala.collection.mutable.ArrayBuffer.empty[Row]
          // synthesized Delete(old) rows are previously-delivered upserts —
          // normalize their _op to "delete" so every deletes-side row
          // carries a consistent marker (genuine markers already do)
          def asDelete(r: Row): Row = {
            val vals = r.toSeq.toArray
            vals(opIdx) = "delete"
            new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(vals, schema)
          }
          if (keyCols.nonEmpty) {
            delRows.foreach { r => prevState.remove(keyOf(r)); dels += r }
            liveRows.foreach { r =>
              if (r.getString(opIdx) == "upsert") {
                val key = keyOf(r)
                prevState.get(key).foreach(prev => dels += asDelete(prev))
                prevState(key) = r
              }
            }
          } else dels ++= delRows
          callback(liveRows, dels.toSeq)
        } else {
          val deletes =
            if (!isUpsert || keyCols.isEmpty) Nil
            else {
              val acc = scala.collection.mutable.ArrayBuffer.empty[Row]
              rows.foreach { r =>
                val key = keyOf(r)
                prevState.get(key).foreach(acc += _)
                prevState(key) = r
              }
              acc.toSeq
            }
          callback(rows, deletes)
        }
      }
      .start()
  }

  /** Stop the internal bus-feed queries (listen() queries are the caller's
    * to stop). Safe to call repeatedly. */
  def close(): Unit = busFeeds.synchronized {
    busFeeds.values.foreach(q => if (q.isActive) q.stop())
    busFeeds.clear()
  }

  /** Materialize a derived table's current contents to an in-memory sink
    * (update/append per its plan) for queries against streaming state. */
  def materialize(table: String): StreamingQuery = {
    frames(table).writeStream
      .outputMode(if (isUpsertPlan(table)) OutputMode.Update() else OutputMode.Append())
      .format("memory")
      .queryName(s"mat_$table")
      .start()
  }

  def processAllAvailable(): Unit =
    spark.streams.active.foreach(_.processAllAvailable())
}

/** Shared helpers for the union state codecs (executor-side). */
private[streaming] object CdcUnionState {
  /** USE_BIG_DECIMAL_FOR_FLOATS: decimals must round-trip the merge at
    * full scale — default Jackson parses JSON numbers to Double and would
    * silently truncate DecimalType(38,18) columns. */
  def mapper(): com.fasterxml.jackson.databind.ObjectMapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.enable(
      com.fasterxml.jackson.databind.DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS)
    m
  }

  /** Fold slot jsons in input order (later inputs overwrite on column
    * overlap — batch Transforms.union semantics); null when no slots. */
  def mergeSlots(mapper: com.fasterxml.jackson.databind.ObjectMapper,
                 slots: java.util.Map[String, String]): String = {
    if (slots.isEmpty) return null
    val acc = new java.util.LinkedHashMap[String, Object]()
    slots.keySet().stream().sorted(java.util.Comparator.comparingInt(Integer.parseInt))
      .forEach { k =>
        val m = mapper.readValue(slots.get(k), classOf[java.util.LinkedHashMap[String, Object]])
        acc.putAll(m)
      }
    mapper.writeValueAsString(acc)
  }
}

/** Per-table subscriber registry (the analog of the reference's
  * ListenerHook fan-out, listener_hook.rs:33-87). Subscribe order:
  * `validate` (a bad table name registers nothing) → register the
  * callback → `ensureFeed` (idempotently start the single internal query
  * feeding all of that table's subscribers; a feed stopped by `close()`
  * restarts on the next subscribe). The callback is registered BEFORE the
  * feed starts so the subscriber that triggers the feed cannot miss the
  * first micro-batch. `keyColumns` is forwarded to the feed for
  * Delete(old) synthesis on upsert plans whose key is not config-inferable
  * (e.g. a function table downstream of an aggregation); only the
  * subscribe that actually starts the feed picks them. `event` restricts
  * the subscription to one change kind, the reference's per-kind listener
  * map (listener_hook.rs:62-74): an Insert subscriber is never invoked for
  * delete-only batches and vice versa. */
final class ListenBus(validate: String => Unit = _ => (),
                      ensureFeed: (String, Seq[String]) => Unit = (_, _) => ()) {
  private val subs = scala.collection.concurrent.TrieMap
    .empty[String, List[(Seq[Row], Seq[Row]) => Unit]]
  def subscribe(table: String, keyColumns: Seq[String] = Nil,
                event: ListenEvent = ListenEvent.Both)
               (cb: (Seq[Row], Seq[Row]) => Unit): Unit = {
    validate(table)
    val wrapped = ListenBus.filtered(event, cb)
    subs.updateWith(table) { cur => Some(wrapped :: cur.getOrElse(Nil)) }
    ensureFeed(table, keyColumns)
  }
  def publish(table: String, inserts: Seq[Row], deletes: Seq[Row]): Unit =
    subs.getOrElse(table, Nil).foreach(cb => cb(inserts, deletes))
}

object ListenBus {
  /** Wrap a callback so it sees only the requested event kind; filtered
    * subscribers are not invoked at all when their kind is empty (the
    * reference pushes nothing to Insert listeners on a delete commit). */
  def filtered(event: ListenEvent, cb: (Seq[Row], Seq[Row]) => Unit)
      : (Seq[Row], Seq[Row]) => Unit = event match {
    case ListenEvent.Both   => cb
    case ListenEvent.Insert => (ins, _) => if (ins.nonEmpty) cb(ins, Nil)
    case ListenEvent.Delete => (_, del) => if (del.nonEmpty) cb(Nil, del)
  }
}
