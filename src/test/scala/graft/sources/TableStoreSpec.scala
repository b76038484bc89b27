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
}
