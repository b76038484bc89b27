package graft.operators

import graft.SparkSpec
import graft.config.PipelineConfig
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** The incremental-maintenance invariant: after ANY sequence of edits,
  * every materialized table equals a from-scratch recompute
  * ([[PipelineGraph]]) over the same final source contents. */
class IncrementalGraphSpec extends SparkSpec {

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
      |    functions: ["curvedGrade ~ grade + 5"]
      |  - name: passing
      |    kind: filter
      |    source_table: grades
      |    filter: "grade >= 60"
      |  - name: stats
      |    kind: aggregation
      |    source_table: grades
      |    aggregated_column: name
      |    functions: ["cnt ~ memo.cnt + 1", "sum ~ memo.sum + grade", "avg ~ memo.sum / memo.cnt"]
      |  - name: profile
      |    kind: union
      |    tables_and_foreign_keys: [[users, name], [stats, aggregatedColumn]]
      |""".stripMargin

  private val gradeSchema = StructType(Seq(
    StructField("name", StringType), StructField("grade", LongType)))
  private val userSchema = StructType(Seq(
    StructField("name", StringType), StructField("age", LongType)))

  private def rows(schema: StructType, rs: Row*): DataFrame =
    spark.createDataFrame(rs.asJava, schema)

  private def canon(df: DataFrame): Set[Seq[Any]] = {
    val keep = df.columns.filterNot(Seq("_entryId", "_sourceEntryId").contains).sorted
    df.select(keep.head, keep.tail: _*).collect().map(_.toSeq).toSet
  }

  test("incremental tables equal from-scratch recompute after mixed edits") {
    val cfg = PipelineConfig.fromYaml(yaml)
    val inc = new IncrementalGraph(spark, cfg)

    inc.insert("grades", rows(gradeSchema, Row("Alex", 90L), Row("Bob", 50L)))
    inc.insert("users", rows(userSchema, Row("Alex", 22L), Row("Cara", 30L)))
    inc.insert("grades", rows(gradeSchema, Row("Alex", 70L), Row("Cara", 88L)))
    inc.delete("grades", "name", "Bob")
    inc.insert("grades", rows(gradeSchema, Row("Bob", 65L)))

    // from-scratch reference: a lazy graph seeded with the SAME final
    // source contents (ids included)
    val scratch = new PipelineGraph(spark, cfg,
      Map("grades" -> inc.table("grades"), "users" -> inc.table("users")))
    Seq("curved", "passing", "stats", "profile").foreach { t =>
      assert(canon(inc.table(t)) == canon(scratch.table(t)), s"table $t diverged")
    }
    // spot-check semantics: Bob's group was fully rebuilt after delete+reinsert
    val stats = inc.table("stats").collect()
      .map(r => r.getAs[String]("aggregatedColumn") -> r.getAs[Long]("sum")).toMap
    assert(stats("Bob") == 65L)
    assert(stats("Alex") == 160L)
  }

  test("delete cascades: group removal and narrow-row retraction") {
    val cfg = PipelineConfig.fromYaml(yaml)
    val inc = new IncrementalGraph(spark, cfg)
    inc.insert("grades", rows(gradeSchema, Row("Alex", 90L), Row("Bob", 70L)))
    inc.delete("grades", "name", "Alex")
    // Alex's group row disappears entirely (the reference deletes the
    // group row when its last source row goes)
    val stats = inc.table("stats").collect().map(_.getAs[String]("aggregatedColumn")).toSet
    assert(stats == Set("Bob"))
    assert(inc.table("curved").count() == 1)
    assert(inc.table("passing").count() == 1)
  }

  test("null grouping keys maintain incrementally (insert null-fills missing columns)") {
    val cfg = PipelineConfig.fromYaml(yaml)
    val inc = new IncrementalGraph(spark, cfg)
    // second insert omits `name` → null-filled → rows land in the null group
    inc.insert("grades", rows(gradeSchema, Row("Alex", 90L)))
    inc.insert("grades",
      spark.createDataFrame(Seq(Row(70L), Row(80L)).asJava,
        StructType(Seq(StructField("grade", LongType)))))
    val scratch = new PipelineGraph(spark, cfg,
      Map("grades" -> inc.table("grades"), "users" -> inc.table("users")))
    assert(canon(inc.table("stats")) == canon(scratch.table("stats")))
    val nullGroup = inc.table("stats").collect()
      .find(_.isNullAt(0)).getOrElse(fail("null group missing"))
    assert(nullGroup.getAs[Long]("sum") == 150L)
  }

  test("listen delivers per-edit deltas; aggregation upserts as Delete(old)+Insert(new)") {
    val cfg = PipelineConfig.fromYaml(yaml)
    val inc = new IncrementalGraph(spark, cfg)
    val ins = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val del = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    inc.listen("stats") { (i, d) =>
      ins ++= i.collect().map(r => r.getAs[String]("aggregatedColumn") -> r.getAs[Long]("sum"))
      del ++= d.collect().map(r => r.getAs[String]("aggregatedColumn") -> r.getAs[Long]("sum"))
    }
    inc.insert("grades", rows(gradeSchema, Row("Alex", 90L)))
    inc.insert("grades", rows(gradeSchema, Row("Alex", 80L)))
    assert(ins.toSeq == Seq("Alex" -> 90L, "Alex" -> 170L))
    assert(del.toSeq == Seq("Alex" -> 90L)) // the Delete half of the upsert
  }

  test("delete(col, null) removes and reports the null-valued rows") {
    val cfg = PipelineConfig.fromYaml(yaml)
    val inc = new IncrementalGraph(spark, cfg)
    inc.insert("grades", rows(gradeSchema, Row("Alex", 90L), Row(null, 50L)))
    val deleted = inc.delete("grades", "name", null)
    assert(deleted.count() == 1 && deleted.collect().head.isNullAt(0))
    assert(inc.table("grades").count() == 1)
    // the null group is gone from the aggregation too
    assert(inc.table("stats").collect().map(_.getAs[String]("aggregatedColumn")).toSet == Set("Alex"))
  }

  test("caller-supplied _entryId survives insert (delta replay keeps identity)") {
    val cfg = PipelineConfig.fromYaml(yaml)
    val inc = new IncrementalGraph(spark, cfg)
    val withId = spark.createDataFrame(
      Seq(Row("Alex", 90L, "fixed-id-1")).asJava,
      StructType(gradeSchema.fields :+ StructField("_entryId", StringType)))
    val committed = inc.insert("grades", withId)
    assert(committed.collect().head.getAs[String]("_entryId") == "fixed-id-1")
    assert(inc.table("grades").collect().head.getAs[String]("_entryId") == "fixed-id-1")
  }

  test("union insert on an EXISTING key merges onto the derived row (no duplicate)") {
    val cfg = PipelineConfig.fromYaml(yaml)
    val inc = new IncrementalGraph(spark, cfg)
    inc.insert("users", rows(userSchema, Row("Alex", 22L)))
    inc.insert("grades", rows(gradeSchema, Row("Alex", 90L)))
    // second insert for the same key: the source log now holds two Alex
    // rows, but the union must upsert — incoming age overwrites, grade
    // stats remain (reference transform.rs:176-228)
    inc.insert("users", rows(userSchema, Row("Alex", 33L)))
    val profile = inc.table("profile").collect()
    assert(profile.count(_.getAs[String]("matchingKey") == "Alex") == 1)
    val alex = profile.find(_.getAs[String]("matchingKey") == "Alex").get
    assert(alex.getAs[Long]("age") == 33L)
    assert(alex.getAs[Long]("sum") == 90L)
  }

  test("union rebuild after delete does not resurrect append-log duplicates") {
    val cfg = PipelineConfig.fromYaml(yaml)
    val inc = new IncrementalGraph(spark, cfg)
    inc.insert("users", rows(userSchema, Row("Alex", 22L)))
    inc.insert("grades", rows(gradeSchema, Row("Alex", 90L), Row("Alex", 80L)))
    inc.insert("users", rows(userSchema, Row("Alex", 33L))) // log: two Alex user rows
    // deleting the grades forces a REBUILD of Alex's profile key — it must
    // collapse the user log to the latest row, not emit one row per log entry
    inc.delete("grades", "name", "Alex")
    val alexRows = inc.table("profile").collect()
      .filter(_.getAs[String]("matchingKey") == "Alex")
    assert(alexRows.length == 1)
    assert(alexRows.head.getAs[Long]("age") == 33L) // time-prefixed max id = latest
  }

  test("duplicate derived rows retract by multiplicity, not wholesale") {
    val cfg = PipelineConfig.fromYaml(
      """tables:
        |  - name: grades
        |    kind: source
        |    columns: {name: Str, grade: Integer}
        |  - name: projected
        |    kind: function
        |    source_table: grades
        |    functions: ["g ~ grade"]
        |""".stripMargin)
    val inc = new IncrementalGraph(spark, cfg)
    inc.insert("grades", rows(gradeSchema, Row("Alex", 90L), Row("Bob", 90L)))
    inc.delete("grades", "name", "Alex")
    // both derived rows projected to (g=90, lineage); only Alex's copy goes
    assert(inc.table("projected").count() == 1)
  }

  test("mid-cascade failure rolls back every table and notifies nobody (reference database.rs:317-396)") {
    // a flaky action: bootstraps fine, then throws while the cascade
    // computes the action table's delta — AFTER upstream tables already
    // applied their part of the edit
    @volatile var explode = false
    ActionRegistry.register(GraftAction("flakyAction", identity,
      s => { if (explode) throw new RuntimeException("boom"); s }))
    val cfg = PipelineConfig.fromYaml(
      """tables:
        |  - name: grades
        |    kind: source
        |    columns: {name: Str, grade: Integer}
        |  - name: stats
        |    kind: aggregation
        |    source_table: grades
        |    aggregated_column: name
        |    functions: ["cnt ~ memo.cnt + 1", "sum ~ memo.sum + grade"]
        |  - name: acted
        |    kind: action
        |    source_table: grades
        |    action: flakyAction
        |""".stripMargin)
    val inc = new IncrementalGraph(spark, cfg)
    inc.insert("grades", rows(gradeSchema, Row("Alex", 90L)))
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    Seq("grades", "stats", "acted").foreach(t => inc.listen(t)((_, _) => calls += t))
    val before = Seq("grades", "stats", "acted").map(t => t -> canon(inc.table(t))).toMap

    explode = true
    assertThrows[RuntimeException](inc.insert("grades", rows(gradeSchema, Row("Alex", 80L))))
    // every table — including those UPSTREAM of the failure — restored
    Seq("grades", "stats", "acted").foreach { t =>
      assert(canon(inc.table(t)) == before(t), s"$t not rolled back")
    }
    assert(calls.isEmpty, s"subscribers must not see a rolled-back edit: $calls")

    // the graph stays usable: the same edit commits once the fault clears
    explode = false
    inc.insert("grades", rows(gradeSchema, Row("Alex", 80L)))
    assert(canon(inc.table("stats")) != before("stats"))
    assert(calls.nonEmpty)
  }
}
