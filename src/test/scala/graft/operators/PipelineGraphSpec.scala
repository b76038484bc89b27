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
    // time-prefixed id: 16 hex epoch-micros chars + '-' + 36-char uuid
    assert(ids.length == 1)
    assert(ids(0).matches("[0-9A-F]{16}-[0-9a-f-]{36}"), ids(0))
  }

  test("a derived table reading from an undeclared table errors at config time") {
    val bad = PipelineConfig.fromYaml(
      """tables:
        |  - name: derived
        |    kind: function
        |    source_table: userz
        |    functions: ["x ~ y"]
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](bad.topoOrder)
    assert(e.getMessage.contains("undeclared table userz"))
  }

  test("insertWithEdits returns every cascaded derived-row write (InsertData response)") {
    val yamlAgg = yaml +
      """  - name: aggTest
        |    kind: aggregation
        |    source_table: testTable
        |    aggregated_column: testForIndex
        |    functions: ["cnt ~ memo.cnt + 1", "sum ~ memo.sum + testForIteration"]
        |""".stripMargin
    val g = new PipelineGraph(spark, PipelineConfig.fromYaml(yamlAgg))
    val schema = StructType(Seq(
      StructField("testForIndex", LongType), StructField("testForIteration", LongType)))
    g.insert("testTable", spark.createDataFrame(
      Seq(Row(1L, 10L)).asJava, schema))

    val edits = g.insertWithEdits("testTable", spark.createDataFrame(
      Seq(Row(1L, 20L), Row(2L, 5L)).asJava, schema))

    // source edit: the two committed rows with assigned ids
    val (srcIns, srcDel) = edits("testTable")
    assert(srcIns.count() == 2 && srcDel.count() == 0)
    assert(srcIns.columns.contains("_entryId"))
    // function cascade: two new derived rows, append-only
    val (dIns, dDel) = edits("derived")
    assert(dIns.count() == 2 && dDel.count() == 0)
    assert(dIns.collect().map(_.getAs[Long]("newColumn")).toSet == Set(22L, 7L))
    // aggregation cascade: group 1 upserts (Delete(old) + Insert(new)),
    // group 2 is a fresh insert — the reference's Update encoding
    val (aIns, aDel) = edits("aggTest")
    val ins = aIns.collect().map(r => r.getAs[Long]("aggregatedColumn") ->
      (r.getAs[Long]("cnt"), r.getAs[Long]("sum"))).toMap
    assert(ins == Map(1L -> (2L, 30L), 2L -> (1L, 5L)))
    val del = aDel.collect().map(r => r.getAs[Long]("aggregatedColumn") ->
      (r.getAs[Long]("cnt"), r.getAs[Long]("sum"))).toMap
    assert(del == Map(1L -> (1L, 10L)))
  }

  test("insertWithEdits cascades deletes through narrow tables downstream of an upsert") {
    val yamlChained =
      """tables:
        |  - name: grades
        |    kind: source
        |    columns: {name: Str, grade: Integer}
        |  - name: stats
        |    kind: aggregation
        |    source_table: grades
        |    aggregated_column: name
        |    functions: ["cnt ~ memo.cnt + 1", "sum ~ memo.sum + grade"]
        |  - name: scaled
        |    kind: function
        |    source_table: stats
        |    functions: ["key ~ aggregatedColumn", "big ~ sum * 10"]
        |""".stripMargin
    val g = new PipelineGraph(spark, PipelineConfig.fromYaml(yamlChained))
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("grade", LongType)))
    g.insert("grades", spark.createDataFrame(Seq(Row("Alex", 9L)).asJava, schema))

    val edits = g.insertWithEdits("grades",
      spark.createDataFrame(Seq(Row("Alex", 1L)).asJava, schema))
    // stats upserts Alex: Delete(sum=9) + Insert(sum=10); the narrow table
    // DERIVED FROM stats must report the cascaded delete of big=90 too
    val (sIns, sDel) = edits("scaled")
    assert(sIns.collect().map(_.getAs[Long]("big")).toSeq == Seq(100L))
    assert(sDel.collect().map(_.getAs[Long]("big")).toSeq == Seq(90L))
  }
}
