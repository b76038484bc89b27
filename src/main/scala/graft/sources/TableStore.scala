package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table persistence for the engine (the reference's per-table storage
  * files, reference: reactive_db/src/storage/storage_manager_v2.rs, are
  * irrelevant physically — SURVEY.md §2.3): each table is a parquet
  * directory, optionally hive-partitioned on low-cardinality columns so
  * key-range queries prune whole directories before any I/O happens
  * (the distributed analog of the reference's mandatory per-column
  * B-tree index).
  *
  * At 100 TB the partition layout IS the index: a `lessThan`/`getAll`
  * on the partition column becomes a metadata-only listing + pruned scan
  * (`PartitionFilters` in the plan), and every other predicate still
  * pushes into parquet row-group stats (`PushedFilters`).
  */
object TableStore {
  def save(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
           mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Save as a BUCKETED catalog table: rows are hash-clustered into
    * `buckets` files per partition on `bucketCols` (optionally sorted
    * within each bucket). Two tables bucketed the same way join WITHOUT
    * any shuffle — at 100 TB this converts every recurring fact⋈fact
    * equi-join on the bucket key from a full-network exchange into a
    * local merge per bucket, the single biggest join optimization
    * available when the key is known at write time. (Bucketing also
    * pre-shuffles groupBy on the bucket key.) */
  def saveBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                   buckets: Int, sortCols: Seq[String] = Nil,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketed save needs at least one bucket column")
    val w = df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  def loadTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write `df` as a Z-ORDERED parquet directory: rows are range-
    * partitioned on the Morton z-value of (`xCol`, `yCol`) (each reduced
    * mod 2^bits) and sorted by it within every file, so each file covers
    * a small (x, y) RECTANGLE of the key space — per-file parquet
    * min/max footers are then tight on BOTH dimensions, and a scan with
    * predicates on either (or both) prunes to the few intersecting files
    * where a single-column sort prunes only on its one column
    * ([[graft.operators.ZOrder]] quantifies the win; this is the write
    * path that cashes it). `repartitionByRange` samples its boundaries —
    * file CUTS are therefore balanced-by-size but not bit-reproducible
    * across engines (the production trade [[graft.operators.ZOrder]]
    * documents); the DATA is untouched, so reads gate exactly.
    *
    * At 100 TB this is the layout step of an ingestion compaction: one
    * range exchange on an 8-byte key + a per-file sort, no global sort. */
  def saveZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                   bits: Int = 16, nFiles: Int = 64,
                   mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    graft.expr.GraftFunctions.register(df.sparkSession)
    import org.apache.spark.sql.functions.{call_function, col, lit, pmod}
    val z = call_function("z_value",
      pmod(col(xCol).cast("long"), lit(1L << bits)),
      pmod(col(yCol).cast("long"), lit(1L << bits)), lit(bits))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)
  }

  /** The LIVE view of an epoch-appended store under TOMBSTONE deletion —
    * the generic merge-on-read step every append-only parquet store here
    * shares (signature store: [[graft.functions.DedupOps.liveStore]];
    * IVF vector store: q172's delete lifecycle): deletions land as
    * (`idCol`, `before_epoch`) rows in a delta-sized side table;
    * replacements append with a higher epoch; a read anti-joins the
    * store against the tombstones, hiding rows of `idCol` with
    * `epochCol` < `before_epoch`. Compaction = rewrite the live view at
    * epoch 0 + truncate tombstones — the cycle every table format with
    * deletion vectors runs, in plain DataFrames.
    *
    * Scale shape: tombstones are delta-sized (broadcast in practice —
    * left to AQE since a mass-deletion epoch can exceed the threshold)
    * and the anti-join keys on the 8-byte id, so no store payload
    * (signatures, embeddings) moves for dropped rows. */
  def liveView(store: DataFrame, tombstones: DataFrame,
               idCol: String, epochCol: String): DataFrame =
    store.join(tombstones,
      store(idCol) === tombstones(idCol) &&
        store(epochCol) < tombstones("before_epoch"),
      "left_anti")

  /** TIME-TRAVEL read of the same epoch-appended store: the live view AS
    * OF epoch `asOfEpoch` — rows appended up to that epoch, minus
    * deletions ISSUED up to it (a tombstone's `before_epoch` is the epoch
    * the deletion landed in, so `before_epoch <= asOfEpoch` selects
    * exactly the deletions that had happened by then). The audit /
    * reproduce-last-week's-training-set read every table format with
    * snapshot isolation offers, in plain DataFrames — composing with
    * [[liveView]] (asOf = max epoch ≡ the live view) and costing one
    * extra map-side epoch filter per side, nothing else.
    *
    * Contract: epochs are monotone (appends never backdate) and
    * compaction rewrites epochs — time travel reaches back to the last
    * compaction, the same horizon real formats have after vacuum. */
  def liveViewAsOf(store: DataFrame, tombstones: DataFrame,
                   idCol: String, epochCol: String, asOfEpoch: Long): DataFrame =
    liveView(store.where(store(epochCol) <= asOfEpoch),
      tombstones.where(tombstones("before_epoch") <= asOfEpoch),
      idCol, epochCol)

  /** SNAPSHOT DIFF between two epochs of the same store — the audit
    * read that answers "what changed between last week's training set
    * and today's": `added` rows live at `toEpoch` but not `fromEpoch`,
    * `removed` rows live at `fromEpoch` but not `toEpoch`, `updated`
    * rows live at both under a DIFFERENT epoch (the tombstone+append
    * replacement pattern q172 uses). Composes [[liveViewAsOf]] twice —
    * the same monotone-epoch contract, the same post-compaction
    * horizon.
    *
    * Scale shape: two anti-joins and one equi-join, all keyed on the
    * 8-byte id; payload columns move only for rows that actually
    * changed (the diff is delta-sized even when the store is not).
    *
    * @return store columns + `op` ∈ {added, removed, updated} — added/
    *         updated rows carry the `toEpoch` version, removed rows the
    *         `fromEpoch` version */
  def epochDiff(store: DataFrame, tombstones: DataFrame, idCol: String,
                epochCol: String, fromEpoch: Long, toEpoch: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val a = liveViewAsOf(store, tombstones, idCol, epochCol, fromEpoch)
    val b = liveViewAsOf(store, tombstones, idCol, epochCol, toEpoch)
    val added = b.join(a.select(col(idCol)), Seq(idCol), "left_anti")
      .withColumn("op", lit("added"))
    val removed = a.join(b.select(col(idCol)), Seq(idCol), "left_anti")
      .withColumn("op", lit("removed"))
    val updated = b
      .join(a.select(col(idCol), a(epochCol).as("__from_epoch")), Seq(idCol))
      .where(col(epochCol) =!= col("__from_epoch")).drop("__from_epoch")
      .withColumn("op", lit("updated"))
    added.unionByName(removed).unionByName(updated)
  }

  /** VACUUM an epoch-appended store to a retention `horizonEpoch`: the
    * physical cleanup step that closes the store lifecycle the other
    * reads here serve (liveView / liveViewAsOf / epochDiff — the cycle
    * real table formats run as vacuum/retention). Two rewrites:
    *
    *   - store rows that were ALREADY DEAD at the horizon (some tombstone
    *     with `before_epoch <= horizonEpoch` covers them) are physically
    *     dropped — no read at or after the horizon can see them;
    *   - tombstones with `before_epoch <= horizonEpoch` are dropped —
    *     every row they killed is gone, so they are spent.
    *
    * Contract (the law the q268 gate oracles): for EVERY `e >=
    * horizonEpoch`, `liveViewAsOf(vacuumed…, e) ≡ liveViewAsOf(original…,
    * e)` — the live view and all still-reachable snapshots are untouched;
    * time travel BEFORE the horizon is destroyed (that is the point —
    * the [[liveViewAsOf]] horizon contract, made explicit).
    *
    * Scale shape: one anti-join of the store against the horizon-old
    * tombstone subset (delta-sized, AQE-broadcast in practice) keyed on
    * the 8-byte id, and one map-side filter over the tombstones. Store
    * payloads move only for surviving rows when the caller rewrites the
    * directory — the anti-join itself carries no payload for dropped
    * rows.
    *
    * @return (vacuumed store, surviving tombstones) */
  def vacuum(store: DataFrame, tombstones: DataFrame, idCol: String,
             epochCol: String, horizonEpoch: Long): (DataFrame, DataFrame) = {
    val old = tombstones.where(tombstones("before_epoch") <= horizonEpoch)
    val kept = store.join(old,
      store(idCol) === old(idCol) && store(epochCol) < old("before_epoch"),
      "left_anti")
    (kept, tombstones.where(tombstones("before_epoch") > horizonEpoch))
  }

  /** ROLLBACK (RESTORE) an epoch-appended store to the snapshot AS OF
    * `toEpoch` — the undo every table format pairs with time travel: a
    * bad ingestion/deletion wave is reverted WITHOUT rewriting history,
    * by appending a COMPENSATION epoch (`newEpoch`, > every existing
    * epoch):
    *
    *   - rows live at `toEpoch` but not live NOW re-append at `newEpoch`
    *     (they were deleted or superseded since — restore resurrects the
    *     old version above everything newer);
    *   - rows live NOW but not at `toEpoch` get a tombstone with
    *     `before_epoch = newEpoch` (they were added or replaced since —
    *     restore hides them).
    *
    * Contract (the q271 law): `liveView(store ∪ appends, tombstones ∪
    * newTombstones)` ≡ `liveViewAsOf(store, tombstones, toEpoch)` —
    * while every PRE-rollback snapshot (any `asOf < newEpoch`) is
    * untouched, because compensation only APPENDS. The rollback is
    * itself time-travelable and vacuumable like any other epoch.
    *
    * Scale shape: two as-of live views diffed on the 8-byte id (the
    * [[epochDiff]] joins); appends carry payload only for genuinely
    * resurrected rows, tombstones are delta-sized.
    *
    * @return (rows to append at `newEpoch`, tombstones to append) */
  def rollback(store: DataFrame, tombstones: DataFrame, idCol: String,
               epochCol: String, toEpoch: Long, newEpoch: Long)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, lit, max}
    // The whole contract rests on `newEpoch` exceeding EVERY epoch the
    // store has ever seen: a stale newEpoch would backdate the
    // compensation — the hide-tombstone would fail to cover newer rows
    // (or cover the resurrection itself) and the "pre-rollback snapshots
    // untouched" law breaks SILENTLY. Validate it against the actual
    // store, not just the caller's word: one epoch-column-only scan
    // (column-pruned at the parquet reader) is cheap next to the diff
    // joins below, and turns silent corruption into a loud failure.
    require(newEpoch > toEpoch,
      s"rollback newEpoch ($newEpoch) must exceed the restore target toEpoch ($toEpoch)")
    val maxSeen = store.select(col(epochCol).cast("long").as("__e"))
      .unionByName(tombstones.select(col("before_epoch").cast("long").as("__e")))
      .agg(max("__e")).head()
    if (!maxSeen.isNullAt(0))
      require(newEpoch > maxSeen.getLong(0),
        s"rollback newEpoch ($newEpoch) must exceed every existing epoch/" +
          s"before_epoch (max seen: ${maxSeen.getLong(0)}) — a stale " +
          "compensation epoch silently corrupts both the restore law and " +
          "pre-rollback snapshots")
    val target = liveViewAsOf(store, tombstones, idCol, epochCol, toEpoch)
    val now = liveView(store, tombstones, idCol, epochCol)
    // resurrect: target rows whose exact (id, epoch) version is not the
    // current live version — covers both deleted ids and replaced ones
    val resurrect = target.as("t")
      .join(now.select(col(idCol), col(epochCol)).as("n"),
        col(s"t.$idCol") === col(s"n.$idCol") &&
          col(s"t.$epochCol") === col(s"n.$epochCol"), "left_anti")
      .withColumn(epochCol, lit(newEpoch))
    // hide: ids whose CURRENT live version is not the target version —
    // added-since ids (no id match) and replaced-since ids (epoch
    // mismatch). The tombstone's before_epoch = newEpoch hides every
    // older version while the resurrected row (epoch == newEpoch)
    // survives the strict `<` of liveView.
    val hide = now.as("n")
      .join(target.select(col(idCol), col(epochCol)).as("t"),
        col(s"n.$idCol") === col(s"t.$idCol") &&
          col(s"n.$epochCol") === col(s"t.$epochCol"), "left_anti")
      .select(col(idCol), lit(newEpoch).as("before_epoch"))
      .distinct()
    (resurrect, hide)
  }

  /** Drop `table` from the catalog AND remove its physical warehouse
    * directory. With the in-memory catalog a previous JVM's table data
    * survives on disk but not in the catalog, and a managed CTAS over a
    * non-empty location refuses — so a lifecycle that rebuilds a store
    * from scratch (rather than appending) must clear both. */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
