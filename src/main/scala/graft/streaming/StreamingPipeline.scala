package graft.streaming

import graft.config._
import graft.expr.{ExprCompiler, ExprParser}
import graft.operators.{SystemColumns, Transforms}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
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
  * Update events surface as Delete(old)+Insert(new) pairs, matching the
  * reference's Update ≡ delete-then-insert (database.rs:282-286),
  * synthesized from per-key state in [[listen]]. [[listenBus]] subscribers
  * are fed by ONE dedicated internal query per table, started lazily on the
  * first subscription — delivery is exactly-once per micro-batch regardless
  * of how many (or zero) independent [[listen]] queries exist.
  */
final class StreamingPipeline(val spark: SparkSession, val config: PipelineConfig) {
  import SystemColumns._

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
      val schema = StructType(s.columns.map { case (n, t) => StructField(n, t) } :+
        StructField(EntryId, StringType))
      implicit val sqlCtx = spark.sqlContext
      implicit val enc = Encoders.row(schema)
      val ms = MemoryStream[Row]
      memStreams(s.name) = ms
      frames(s.name) = ms.toDF()
    case f: FunctionTableConfig =>
      frames(f.name) = Transforms.function(frames(f.sourceTable), f.functions)
    case f: FilterTableConfig =>
      frames(f.name) = Transforms.filter(frames(f.sourceTable), f.filter)
    case a: AggregationTableConfig =>
      frames(a.name) = Transforms.aggregation(frames(a.sourceTable), a.aggregatedColumn, a.functions)
    case u: UnionTableConfig =>
      frames(u.name) = streamingUnion(u)
    case a: ActionTableConfig =>
      frames(a.name) = Transforms.action(frames(a.sourceTable), graft.operators.ActionRegistry.get(a.actionName))
  }

  def table(name: String): DataFrame = frames(name)

  /** Insert rows into a source stream (the analog of InsertData). */
  def insert(table: String, rows: Seq[Row]): Unit = {
    val ms = memStreams.getOrElse(table,
      throw new IllegalArgumentException(s"$table is not a source table"))
    val withIds = rows.map(r => Row.fromSeq(r.toSeq :+ java.util.UUID.randomUUID().toString))
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
        to_json(struct(df.columns.filter(_ != MatchingKey).map(col): _*)).as("v")))
      .reduce(_.unionByName(_))

    implicit val stringTupleEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    implicit val outEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    val merged = tagged.as[(String, String)](stringTupleEnc)
      .groupByKey(_._1)(Encoders.STRING)
      .mapGroupsWithState[String, (String, String)](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[String]) =>
          // USE_BIG_DECIMAL_FOR_FLOATS: decimals must round-trip the merge
          // at full scale — default Jackson parses JSON numbers to Double
          // and would silently truncate DecimalType(38,18) columns
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          mapper.enable(
            com.fasterxml.jackson.databind.DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS)
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
    * receives (inserts, deletes) per micro-batch. Upsert-containing plans
    * run in update mode and synthesize Delete(old)+Insert(new); pure narrow
    * plans are append-only (inserts only). Multiple subscribers per table
    * each get their own uniquely-named query, independent of the bus. */
  def listen(table: String, keyColumns: Seq[String] = Nil)
            (callback: (Seq[Row], Seq[Row]) => Unit): StreamingQuery =
    startQuery(table, keyColumns)(callback)

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
    val prevState = scala.collection.mutable.Map.empty[Seq[Any], Row]
    df.writeStream
      .outputMode(mode)
      .queryName(s"listen_${table}_${queryCounter.incrementAndGet()}")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect().toSeq
        val deletes =
          if (!isUpsert || keyCols.isEmpty) Nil
          else {
            val acc = scala.collection.mutable.ArrayBuffer.empty[Row]
            val schema = batch.schema
            rows.foreach { r =>
              val key = keyCols.map(k => r.getAs[Any](schema.fieldIndex(k)))
              prevState.get(key).foreach(acc += _)
              prevState(key) = r
            }
            acc.toSeq
          }
        callback(rows, deletes)
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
  * subscribe that actually starts the feed picks them. */
final class ListenBus(validate: String => Unit = _ => (),
                      ensureFeed: (String, Seq[String]) => Unit = (_, _) => ()) {
  private val subs = scala.collection.concurrent.TrieMap
    .empty[String, List[(Seq[Row], Seq[Row]) => Unit]]
  def subscribe(table: String, keyColumns: Seq[String] = Nil)
               (cb: (Seq[Row], Seq[Row]) => Unit): Unit = {
    validate(table)
    subs.updateWith(table) { cur => Some(cb :: cur.getOrElse(Nil)) }
    ensureFeed(table, keyColumns)
  }
  def publish(table: String, inserts: Seq[Row], deletes: Seq[Row]): Unit =
    subs.getOrElse(table, Nil).foreach(cb => cb(inserts, deletes))
}
