package graft.streaming

import graft.{ListenEvent, SparkSpec}
import graft.config.PipelineConfig
import org.apache.spark.sql.Row

/** DeleteData cascading through the STREAMING pipeline — the reference's
  * PostDelete hook path (transform_hook.rs:56-64) in micro-batch form:
  * deletes travel as `_op` envelopes through function/filter/union into
  * retracting aggregates (CdcOps). */
class CdcPipelineSpec extends SparkSpec {

  private val yaml =
    """tables:
      |  - name: grades
      |    kind: source
      |    columns: {name: Str, grade: Integer}
      |  - name: users
      |    kind: source
      |    columns: {name: Str, age: Integer}
      |  - name: curved
      |    kind: function
      |    source_table: grades
      |    functions: ["name ~ name", "curved ~ grade + 5"]
      |  - name: passing
      |    kind: filter
      |    source_table: grades
      |    filter: "grade >= 60"
      |  - name: aggOverFunction
      |    kind: aggregation
      |    source_table: curved
      |    aggregated_column: name
      |    functions: ["count ~ memo.count + 1", "sum ~ memo.sum + curved", "average ~ memo.sum / memo.count"]
      |  - name: aggOverFilter
      |    kind: aggregation
      |    source_table: passing
      |    aggregated_column: name
      |    functions: ["count ~ memo.count + 1", "sum ~ memo.sum + grade"]
      |  - name: unionTest
      |    kind: union
      |    tables_and_foreign_keys: [[users, name], [grades, name]]
      |""".stripMargin

  private def cdcPipeline() = new StreamingPipeline(spark, PipelineConfig.fromYaml(yaml), cdc = true)

  test("delete retracts through a FUNCTION into the aggregate (corrected group downstream)") {
    val p = cdcPipeline()
    val ups = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = p.listen("aggOverFunction") { (ins, _) => ups.synchronized { ups ++= ins } }
    try {
      p.insert("grades", Seq(Row("Alex", 90L), Row("Alex", 80L)))
      q.processAllAvailable()
      assert(ups.last.getAs[Long]("sum") == 180L)   // 95 + 85
      assert(ups.last.getAs[Long]("count") == 2L)
      p.delete("grades", Seq(Row("Alex", 80L)))
      q.processAllAvailable()
      assert(ups.last.getAs[Long]("sum") == 95L)
      assert(ups.last.getAs[Long]("count") == 1L)
      assert(ups.last.getAs[Long]("average") == 95L)
    } finally q.stop()
  }

  test("delete retracts through a FILTER; a fully-retracted group emits a delete marker") {
    val p = cdcPipeline()
    val ups = scala.collection.mutable.ArrayBuffer.empty[Row]
    val dels = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = p.listen("aggOverFilter") { (i, d) =>
      ups.synchronized { ups ++= i; dels ++= d }
    }
    try {
      // 50 fails the filter on insert AND on delete — it never reaches the
      // aggregate in either direction, so the fold stays balanced
      p.insert("grades", Seq(Row("Alex", 90L), Row("Alex", 50L), Row("Bob", 70L)))
      q.processAllAvailable()
      assert(ups.filter(_.getAs[String]("aggregatedColumn") == "Alex").last.getAs[Long]("sum") == 90L)
      p.delete("grades", Seq(Row("Alex", 50L)))
      q.processAllAvailable()
      val alexAfter = ups.count(_.getAs[String]("aggregatedColumn") == "Alex")
      p.delete("grades", Seq(Row("Alex", 90L)))
      q.processAllAvailable()
      // no new upsert for Alex, one delete marker instead
      assert(ups.count(_.getAs[String]("aggregatedColumn") == "Alex") == alexAfter)
      val marker = dels.filter(_.getAs[String]("aggregatedColumn") == "Alex")
      assert(marker.length == 1 && marker.head.getAs[String]("_op") == "delete")
      // Bob untouched
      assert(ups.filter(_.getAs[String]("aggregatedColumn") == "Bob").last.getAs[Long]("sum") == 70L)
    } finally q.stop()
  }

  test("CDC union: delete removes one source's contribution, then the whole key") {
    val p = cdcPipeline()
    val ins = scala.collection.mutable.ArrayBuffer.empty[Row]
    val dels = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = p.listen("unionTest") { (i, d) => ins.synchronized { ins ++= i; dels ++= d } }
    try {
      p.insert("users", Seq(Row("Alex", 22L)))
      q.processAllAvailable()
      p.insert("grades", Seq(Row("Alex", 95L)))
      q.processAllAvailable()
      val merged = ins.last
      assert(merged.getAs[Long]("age") == 22L && merged.getAs[Long]("grade") == 95L)
      // retract the grades row: new merged row keeps age, loses grade
      p.delete("grades", Seq(Row("Alex", 95L)))
      q.processAllAvailable()
      assert(ins.last.getAs[Long]("age") == 22L)
      assert(ins.last.isNullAt(ins.last.fieldIndex("grade")))
      // the old merged row was explicitly retracted
      assert(dels.exists(r => !r.isNullAt(r.fieldIndex("grade")) && r.getAs[Long]("grade") == 95L))
      // retract the last contribution: only a delete marker, no insert
      val insBefore = ins.length
      p.delete("users", Seq(Row("Alex", 22L)))
      q.processAllAvailable()
      assert(ins.length == insBefore)
      assert(dels.last.getAs[Long]("age") == 22L)
    } finally q.stop()
  }

  test("per-event-kind subscriptions: Insert XOR Delete (reference network_types.rs:33-37)") {
    val p = cdcPipeline()
    var insertCalls, deleteCalls = 0
    val insSeen = scala.collection.mutable.ArrayBuffer.empty[Row]
    val delSeen = scala.collection.mutable.ArrayBuffer.empty[Row]
    p.listenBus.subscribe("unionTest", event = ListenEvent.Insert) { (i, d) =>
      insSeen.synchronized { insertCalls += 1; insSeen ++= i; assert(d.isEmpty) }
    }
    p.listenBus.subscribe("unionTest", event = ListenEvent.Delete) { (i, d) =>
      delSeen.synchronized { deleteCalls += 1; delSeen ++= d; assert(i.isEmpty) }
    }
    try {
      p.insert("users", Seq(Row("Alex", 22L)))
      p.processAllAvailable()
      p.delete("users", Seq(Row("Alex", 22L)))
      p.processAllAvailable()
      insSeen.synchronized {
        assert(insertCalls == 1 && insSeen.length == 1)
      }
      delSeen.synchronized {
        assert(deleteCalls == 1 && delSeen.length == 1)
        assert(delSeen.head.getAs[Long]("age") == 22L)
      }
    } finally p.close()
  }

  test("delete() on a non-CDC pipeline fails loudly") {
    val p = new StreamingPipeline(spark, PipelineConfig.fromYaml(yaml))
    assertThrows[IllegalArgumentException](p.delete("grades", Seq(Row("Alex", 90L))))
  }

  test("listen batch guard: a micro-batch beyond listenMaxBatchRows kills the feed") {
    val p = cdcPipeline()
    p.listenMaxBatchRows = 2
    val q = p.listen("grades") { (_, _) => () }
    try {
      p.insert("grades", (1 to 10).map(i => Row(s"u$i", i.toLong)))
      assertThrows[Exception](q.processAllAvailable())
      assert(!q.isActive)
    } finally if (q.isActive) q.stop()
  }

  test("listen batch guard is read per batch: lowering it after start kills a later oversized batch") {
    val p = cdcPipeline()
    val q = p.listen("grades") { (_, _) => () }
    try {
      p.insert("grades", (1 to 10).map(i => Row(s"u$i", i.toLong)))
      q.processAllAvailable() // passes under the default guard
      assert(q.isActive)
      p.listenMaxBatchRows = 2 // mutate AFTER the feed started
      p.insert("grades", (11 to 20).map(i => Row(s"u$i", i.toLong)))
      assertThrows[Exception](q.processAllAvailable())
      assert(!q.isActive)
    } finally if (q.isActive) q.stop()
  }

  test("CDC: filter downstream of an aggregation is rejected at construction") {
    val bad = yaml +
      """  - name: filterOverAgg
        |    kind: filter
        |    source_table: aggOverFunction
        |    filter: "sum > 100"
        |""".stripMargin
    val e = intercept[IllegalArgumentException](
      new StreamingPipeline(spark, PipelineConfig.fromYaml(bad), cdc = true))
    assert(e.getMessage.contains("retraction markers"))
    // the same topology is still legal without CDC (append/update semantics,
    // no retraction markers to lose)
    new StreamingPipeline(spark, PipelineConfig.fromYaml(bad))
  }

  test("CDC: function downstream of an aggregation is rejected at construction") {
    val bad = yaml +
      """  - name: fnOverAgg
        |    kind: function
        |    source_table: aggOverFunction
        |    functions: ["doubled ~ sum * 2"]
        |""".stripMargin
    val e = intercept[IllegalArgumentException](
      new StreamingPipeline(spark, PipelineConfig.fromYaml(bad), cdc = true))
    assert(e.getMessage.contains("retraction markers"))
  }

  test("synthesized Delete(old) rows carry _op=delete (not the stored upsert marker)") {
    val p = cdcPipeline()
    val dels = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = p.listen("aggOverFunction") { (_, d) => dels.synchronized { dels ++= d } }
    try {
      p.insert("grades", Seq(Row("Alex", 90L)))
      q.processAllAvailable()
      p.insert("grades", Seq(Row("Alex", 80L))) // second upsert synthesizes Delete(old)
      q.processAllAvailable()
      p.delete("grades", Seq(Row("Alex", 90L), Row("Alex", 80L))) // genuine marker
      q.processAllAvailable()
      dels.synchronized {
        assert(dels.nonEmpty)
        assert(dels.forall(_.getAs[String]("_op") == "delete"))
        // the synthesized row is the OLD group value, marker normalized
        assert(dels.exists(r => r.getAs[Long]("sum") == 95L))
      }
    } finally q.stop()
  }

  test("cdcUnion converges when insert+delete for one key land in ONE micro-batch (both orders)") {
    val p = cdcPipeline()
    val ins = scala.collection.mutable.ArrayBuffer.empty[Row]
    val dels = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = p.listen("unionTest") { (i, d) => ins.synchronized { ins ++= i; dels ++= d } }
    try {
      // order A: insert then delete in the same batch → no net row, 10 keys
      (1 to 10).foreach { i =>
        p.insert("users", Seq(Row(s"a$i", i.toLong)))
        p.delete("users", Seq(Row(s"a$i", i.toLong)))
      }
      q.processAllAvailable()
      ins.synchronized {
        assert(!ins.exists(_.getAs[String]("matchingKey").startsWith("a")),
          s"insert+delete in one batch must not resurrect: ${ins.mkString(", ")}")
      }
      // order B: pre-existing row, then delete(old)+insert(new) in one batch
      (1 to 10).foreach(i => p.insert("users", Seq(Row(s"b$i", i.toLong))))
      q.processAllAvailable()
      (1 to 10).foreach { i =>
        p.delete("users", Seq(Row(s"b$i", i.toLong)))
        p.insert("users", Seq(Row(s"b$i", 100L + i)))
      }
      q.processAllAvailable()
      ins.synchronized {
        (1 to 10).foreach { i =>
          val last = ins.filter(_.getAs[String]("matchingKey") == s"b$i").last
          assert(last.getAs[Long]("age") == 100L + i,
            s"delete+insert in one batch must keep the re-insert for b$i")
        }
      }
    } finally q.stop()
  }
}
