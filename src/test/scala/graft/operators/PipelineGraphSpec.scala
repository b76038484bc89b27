package graft.operators

import graft.SparkSpec
import graft.config.PipelineConfig
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** End-to-end replication of the reference's own database tests
  * (reference: reactive_db/src/tests/database_test.rs:18-173) through the
  * YAML config → PipelineGraph → QueryService path. */
class PipelineGraphSpec extends SparkSpec {

  private val yaml =
    """tables:
      |  - name: testTable
      |    kind: source
      |    columns: {testForIndex: Integer, testForIteration: Integer}
      |  - name: derived
      |    kind: function
      |    source_table: testTable
      |    functions: ["newColumn ~ testForIteration + 2"]
      |  - name: filterTest
      |    kind: filter
      |    source_table: testTable
      |    filter: "(testForIndex < 11) && (testForIteration > 14)"
      |""".stripMargin

  private def freshGraph(): PipelineGraph =
    new PipelineGraph(spark, PipelineConfig.fromYaml(yaml))

  private def insert29(g: PipelineGraph): Unit = {
    val rows = (0 until 29).map(i => Row((i % 11).toLong, i.toLong))
    val schema = StructType(Seq(
      StructField("testForIndex", LongType), StructField("testForIteration", LongType)))
    g.insert("testTable", spark.createDataFrame(rows.asJava, schema))
  }

  test("insert 29 rows; FindOne source; FindOne derived by _sourceEntryId; newColumn == it+2") {
    val g = freshGraph()
    insert29(g)
    val qs = new QueryService(g)
    val found = qs.findOne("testTable", "testForIteration", 15L).collect()
    assert(found.length == 1)
    val entryId = found(0).getAs[String]("_entryId")
    assert(entryId != null && entryId.nonEmpty)
    val derived = qs.findOne("derived", "_sourceEntryId", entryId).collect()
    assert(derived.length == 1)
    assert(derived(0).getAs[Long]("newColumn") == 17L) // database_test.rs:18-97
  }

  test("LessThan returns rows 0..4 ascending") {
    val g = freshGraph()
    insert29(g)
    val qs = new QueryService(g)
    val rows = qs.lessThan("testTable", "testForIteration", 5L).collect()
    assert(rows.map(_.getAs[Long]("testForIteration")).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("GreaterThan is INCLUSIVE: key 10 included") {
    val g = freshGraph()
    insert29(g)
    val qs = new QueryService(g)
    val rows = qs.greaterThan("testTable", "testForIteration", 10L).collect()
    assert(rows.map(_.getAs[Long]("testForIteration")).toSeq == (10L to 28L))
  }

  test("delete cascades to derived tables via recompute") {
    val g = freshGraph()
    insert29(g)
    val deleted = g.delete("testTable", "testForIteration", 15L)
    assert(deleted.count() == 1)
    val qs = new QueryService(g)
    assert(qs.getAll("testTable", "testForIteration", 15L).count() == 0)
    assert(qs.findOne("derived", "newColumn", 17L).count() == 0)
    assert(qs.findOne("derived", "newColumn", 18L).count() == 1)
  }

  test("insert with undeclared column errors (Missmatched Input)") {
    val g = freshGraph()
    val bad = spark.createDataFrame(
      Seq(Row(1L, 2L, "x")).asJava,
      StructType(Seq(StructField("testForIndex", LongType),
        StructField("testForIteration", LongType), StructField("rogue", StringType))))
    val e = intercept[IllegalArgumentException](g.insert("testTable", bad))
    assert(e.getMessage.contains("Missmatched Input"))
  }

  test("query on unknown column errors like the reference") {
    val g = freshGraph()
    insert29(g)
    val qs = new QueryService(g)
    val e = intercept[NoSuchElementException](qs.findOne("testTable", "nope", 1L))
    assert(e.getMessage.contains("No such column"))
  }

  test("committed inserts report _entryId per row") {
    val g = freshGraph()
    val schema = StructType(Seq(
      StructField("testForIndex", LongType), StructField("testForIteration", LongType)))
    val committed = g.insert("testTable",
      spark.createDataFrame(Seq(Row(1L, 2L)).asJava, schema))
    val ids = committed.select("_entryId").collect().map(_.getString(0))
    assert(ids.length == 1 && ids(0).length == 36)
  }
}
