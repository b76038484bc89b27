package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class TableStoreSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned round-trip; key predicates prune partitions before I/O") {
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString
    val df = (1 to 1000).map(i => (i.toLong % 10, i.toLong, s"row$i")).toDF("bucket", "id", "v")
    TableStore.save(df, dir, partitionBy = Seq("bucket"))

    val loaded = TableStore.load(spark, dir)
    assert(loaded.count() == 1000)

    val q = loaded.where(col("bucket") === 3).select("id")
    assert(q.count() == 100)
    // the partition predicate must land in PartitionFilters (metadata-only
    // pruning), not survive as a post-scan filter over all partitions
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.nonEmpty, "partition filter was not pruned")
    assert(scan.relation.location.inputFiles.length > 1) // genuinely partitioned layout
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("co-bucketed tables join with NO shuffle exchange") {
    val fact = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "qty")
    val dim = (0 until 50).map(i => (i.toLong, s"name$i")).toDF("k", "name")
    TableStore.saveBucketed(fact, "ts_fact", Seq("k"), buckets = 8, sortCols = Seq("k"))
    TableStore.saveBucketed(dim, "ts_dim", Seq("k"), buckets = 8, sortCols = Seq("k"))
    // force a non-broadcast join so the bucketing is what's being tested
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = TableStore.loadTable(spark, "ts_fact")
        .join(TableStore.loadTable(spark, "ts_dim"), Seq("k"))
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS ts_fact")
      spark.sql("DROP TABLE IF EXISTS ts_dim")
    }
  }

  test("non-partition predicates still push into the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_store2").toString
    TableStore.save((1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir)
    val q = TableStore.load(spark, dir).where(col("id") > 90)
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.metadata("PushedFilters").contains("GreaterThan(id,90)"))
    assert(q.count() == 10)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("z-ordered layout prunes a 2-dim predicate to fewer files than an x-sort") {
    // hash-spread dims over a 256×256 domain, 20k rows → 16 files per layout
    val base = spark.range(1, 20001)
      .select(pmod(col("id") * 2654435761L, lit(256L)).as("x"),
        pmod(col("id") * 40503L, lit(256L)).as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft_x").toString
    TableStore.saveZOrdered(base, zDir, "x", "y", bits = 8, nFiles = 16)
    base.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    // the data round-trips exactly regardless of layout
    val zBack = TableStore.load(spark, zDir)
    assert(zBack.count() == 20000)

    // a stats-based pruner reads a file iff its [min,max] box intersects
    // the predicate rectangle — count those boxes per layout: every
    // x-sorted stripe spans the full y domain, so a y-window prunes
    // nothing there, while z-order files are small rectangles
    def filesTouching(dir: String): Long = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
      stats.where(col("x1") >= 0 && col("x0") <= 63 &&
        col("y1") >= 64 && col("y0") <= 127).count()
    }
    val zTouched = filesTouching(zDir)
    val xTouched = filesTouching(xDir)
    // x in [0,63] (1/4 of domain), y in [64,127] (1/4): the x-sort reads
    // every stripe overlapping x≤63 (~4 of 16, each full-height → all 4
    // intersect), z-order reads only the rectangle's files (~1/16 of area)
    assert(zTouched < xTouched,
      s"z-order must touch fewer files: z=$zTouched x=$xTouched")
    // and the pruned scan still answers exactly
    val exact = base.where(col("x") <= 63 && col("y").between(64, 127)).count()
    assert(zBack.where(col("x") <= 63 && col("y").between(64, 127)).count() == exact)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(zDir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(xDir))
  }

  test("liveView hides tombstoned epochs, keeps replacements and untouched rows") {
    import spark.implicits._
    val store = Seq(
      (1L, 0L, "a0"), // replaced at epoch 1 → epoch-0 row hidden
      (1L, 1L, "a1"),
      (2L, 0L, "b0"), // deleted outright
      (3L, 0L, "c0")  // untouched
    ).toDF("vid", "epoch", "payload")
    val tomb = Seq((1L, 1L), (2L, 1L)).toDF("vid", "before_epoch")
    val live = TableStore.liveView(store, tomb, "vid", "epoch")
      .collect().map(r => (r.getAs[Long]("vid"), r.getAs[String]("payload"))).toSet
    assert(live == Set((1L, "a1"), (3L, "c0")))
    // compaction invariant: liveView(live rewritten at epoch 0, ∅) ≡ live
    val rewritten = TableStore.liveView(store, tomb, "vid", "epoch")
      .withColumn("epoch", org.apache.spark.sql.functions.lit(0L))
    val emptyTomb = Seq.empty[(Long, Long)].toDF("vid", "before_epoch")
    val after = TableStore.liveView(rewritten, emptyTomb, "vid", "epoch")
      .collect().map(r => (r.getAs[Long]("vid"), r.getAs[String]("payload"))).toSet
    assert(after == live)
  }

  test("liveViewAsOf: per-epoch snapshots honor append and deletion timing; max epoch ≡ liveView") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // id 1 @e0 (deleted in e1), id 2 @e0, id 3 @e1, id 2 replaced @e2
    val store = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L), (2L, "b2", 2L))
      .toDF("id", "payload", "epoch")
    val tomb = Seq((1L, 1L), (2L, 2L)) // id 2's tombstone covers only its e0 row
      .toDF("id", "before_epoch")
    def read(e: Long) = TableStore.liveViewAsOf(store, tomb, "id", "epoch", e)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSet
    assert(read(0L) == Set((1L, "a"), (2L, "b")))        // nothing deleted yet
    assert(read(1L) == Set((2L, "b"), (3L, "c")))        // id 1's e1 deletion applies
    assert(read(2L) == Set((2L, "b2"), (3L, "c")))       // e0 'b' hidden, e2 'b2' live
    val live = TableStore.liveView(store, tomb, "id", "epoch")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSet
    assert(read(2L) == live)
  }

  test("epochDiff classifies added / removed / updated between two snapshots") {
    import spark.implicits._
    // base @e0: ids 1,2,3; e2: id 2 replaced (tombstone+append), id 3
    // deleted, id 4 appended fresh
    val store = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L),
        (2L, "b2", 2L), (4L, "d", 2L))
      .toDF("id", "payload", "epoch")
    val tomb = Seq((2L, 2L), (3L, 2L)).toDF("id", "before_epoch")
    val got = TableStore.epochDiff(store, tomb, "id", "epoch", 1L, 2L)
      .collect().map(r => (r.getAs[String]("op"), r.getAs[Long]("id"),
        r.getAs[String]("payload"), r.getAs[Long]("epoch"))).toSet
    assert(got == Set(
      ("added", 4L, "d", 2L),
      ("removed", 3L, "c", 0L),
      ("updated", 2L, "b2", 2L)))
    // identical epochs diff to empty
    assert(TableStore.epochDiff(store, tomb, "id", "epoch", 2L, 2L).isEmpty)
  }

  test("rollback restores the as-of snapshot by compensation: resurrects deleted/replaced, hides added, history intact") {
    import spark.implicits._
    // e0: ids 1,2,3; e1: id2 replaced; e2: id1 replaced, id3 deleted,
    // id4 added — roll back to epoch 1 at compensation epoch 3
    val store = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L),
        (2L, "b1", 1L), (1L, "a2", 2L), (4L, "d", 2L))
      .toDF("id", "payload", "epoch")
    val tomb = Seq((2L, 1L), (1L, 2L), (3L, 2L)).toDF("id", "before_epoch")
    val (app, ht) = TableStore.rollback(store, tomb, "id", "epoch",
      toEpoch = 1L, newEpoch = 3L)
    val appRows = app.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[String]("payload"), r.getAs[Long]("epoch"))).toSet
    // resurrected: id1's replaced old version, id3's deleted version
    assert(appRows == Set((1L, "a", 3L), (3L, "c", 3L)))
    val hideRows = ht.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[Long]("before_epoch"))).toSet
    // hidden: id1's since-version and the added id4
    assert(hideRows == Set((1L, 3L), (4L, 3L)))
    // the law: post-rollback live view == the as-of target
    def payloads(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSet
    val after = payloads(TableStore.liveView(store.unionByName(app),
      tomb.unionByName(ht), "id", "epoch"))
    val target = payloads(TableStore.liveViewAsOf(store, tomb, "id", "epoch", 1L))
    assert(after == target && target == Set((1L, "a"), (2L, "b1"), (3L, "c")))
    // pre-rollback snapshots are untouched (compensation only appends)
    for (e <- 0L to 2L)
      assert(payloads(TableStore.liveViewAsOf(store.unionByName(app),
        tomb.unionByName(ht), "id", "epoch", e)) ==
        payloads(TableStore.liveViewAsOf(store, tomb, "id", "epoch", e)),
        s"pre-rollback snapshot $e changed")
  }

  test("vacuum drops horizon-dead rows and spent tombstones; every as-of >= horizon is untouched") {
    import spark.implicits._
    // id 1 @e0 replaced @e1; id 2 @e0 deleted @e2; id 3 @e0 replaced @e3
    // (PAST horizon 2 — victim must survive); id 4 untouched
    val store = Seq((1L, "a0", 0L), (1L, "a1", 1L), (2L, "b0", 0L),
        (3L, "c0", 0L), (3L, "c3", 3L), (4L, "d0", 0L))
      .toDF("id", "payload", "epoch")
    val tomb = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "before_epoch")
    val (vs, vt) = TableStore.vacuum(store, tomb, "id", "epoch", horizonEpoch = 2L)
    val keptRows = vs.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSet
    // dropped: (1,a0) dead via be=1, (2,b0) dead via be=2; (3,c0) stays —
    // its tombstone is past the horizon
    assert(keptRows == Set((1L, "a1"), (3L, "c0"), (3L, "c3"), (4L, "d0")))
    val keptTombs = vt.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[Long]("before_epoch"))).toSet
    assert(keptTombs == Set((3L, 3L)))
    // retention law: liveViewAsOf parity at every epoch >= horizon
    for (e <- 2L to 3L) {
      def rd(s: org.apache.spark.sql.DataFrame, t: org.apache.spark.sql.DataFrame) =
        TableStore.liveViewAsOf(s, t, "id", "epoch", e)
          .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSet
      assert(rd(vs, vt) == rd(store, tomb), s"as-of $e diverged after vacuum")
    }
    // and the pre-horizon snapshot is (intentionally) destroyed
    val asOf0 = TableStore.liveViewAsOf(vs, vt, "id", "epoch", 0L)
      .collect().map(_.getAs[String]("payload")).toSet
    assert(asOf0 != Set("a0", "b0", "c0", "d0"))
  }
}
