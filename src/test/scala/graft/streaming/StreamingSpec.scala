package graft.streaming

import graft.SparkSpec
import graft.config.PipelineConfig
import graft.operators.{ActionRegistry, GraftAction}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Streaming rendition of the reference's reactive cascade + Listen
  * (reference: reactivedb_rust_client/src/bin/usage_example.rs flow). */
class StreamingSpec extends SparkSpec {

  private val yaml =
    """tables:
      |  - name: grades
      |    kind: source
      |    columns: {name: Str, grade: Integer}
      |  - name: users
      |    kind: source
      |    columns: {name: Str, age: Integer}
      |  - name: derived
      |    kind: function
      |    source_table: grades
      |    functions: ["curved ~ grade + 5"]
      |  - name: passing
      |    kind: filter
      |    source_table: grades
      |    filter: "grade >= 60"
      |  - name: aggregationTest
      |    kind: aggregation
      |    source_table: grades
      |    aggregated_column: name
      |    functions: ["count ~ memo.count + 1", "sum ~ memo.sum + grade", "average ~ memo.sum / memo.count"]
      |  - name: unionTest
      |    kind: union
      |    tables_and_foreign_keys: [[users, name], [grades, name]]
      |""".stripMargin

  test("function/filter cascade + listen receives inserts per batch") {
    val p = new StreamingPipeline(spark, PipelineConfig.fromYaml(yaml))
    val inserts = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = p.listen("derived") { (ins, _) => inserts.synchronized { inserts ++= ins } }
    try {
      p.insert("grades", Seq(Row("Alex", 95L), Row("Bob", 50L)))
      q.processAllAvailable()
      assert(inserts.map(_.getAs[Long]("curved")).toSet == Set(100L, 55L))
      p.insert("grades", Seq(Row("Cara", 70L)))
      q.processAllAvailable()
      assert(inserts.length == 3)
    } finally q.stop()
  }

  test("streaming aggregation upserts per group; update surfaces delete+insert") {
    val p = new StreamingPipeline(spark, PipelineConfig.fromYaml(yaml))
    val ins = scala.collection.mutable.ArrayBuffer.empty[Row]
    val del = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = p.listen("aggregationTest") { (i, d) =>
      ins.synchronized { ins ++= i; del ++= d }
    }
    try {
      p.insert("grades", Seq(Row("Alex", 90L)))
      q.processAllAvailable()
      p.insert("grades", Seq(Row("Alex", 80L)))
      q.processAllAvailable()
      val alexRows = ins.filter(_.getAs[String]("aggregatedColumn") == "Alex")
      assert(alexRows.last.getAs[Long]("sum") == 170L)
      assert(alexRows.last.getAs[Long]("average") == 85L)
      // reference Update ≡ Delete(old) + Insert(new) (database.rs:282-286)
      assert(del.length == 1 && del.head.getAs[Long]("sum") == 90L)
    } finally q.stop()
  }

  test("streaming union merges by matchingKey across sources") {
    val p = new StreamingPipeline(spark, PipelineConfig.fromYaml(yaml))
    val latest = scala.collection.mutable.Map.empty[String, Row]
    val q = p.listen("unionTest") { (ins, _) =>
      latest.synchronized { ins.foreach(r => latest(r.getAs[String]("matchingKey")) = r) }
    }
    try {
      p.insert("users", Seq(Row("Alex", 22L)))
      q.processAllAvailable()
      p.insert("grades", Seq(Row("Alex", 95L)))
      q.processAllAvailable()
      val alex = latest("Alex")
      assert(alex.getAs[Long]("age") == 22L)
      assert(alex.getAs[Long]("grade") == 95L)
    } finally q.stop()
  }

  test("listen on a table DOWNSTREAM of an aggregation uses update mode; two subscribers coexist; bus fans out") {
    val yamlChained = yaml +
      """  - name: scaled
        |    kind: function
        |    source_table: aggregationTest
        |    functions: ["big ~ sum * 10"]
        |""".stripMargin
    val p = new StreamingPipeline(spark, PipelineConfig.fromYaml(yamlChained))
    val got1 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val viaBus = scala.collection.mutable.ArrayBuffer.empty[Long]
    p.listenBus.subscribe("scaled") { (ins, _) =>
      viaBus.synchronized { viaBus ++= ins.map(_.getAs[Long]("big")) }
    }
    // a plan containing a streaming aggregation must start in update mode
    // even though `scaled` itself is a narrow Function table — and a
    // second subscriber must not collide on the query name
    val q1 = p.listen("scaled") { (ins, _) => got1.synchronized { got1 ++= ins.map(_.getAs[Long]("big")) } }
    val q2 = p.listen("scaled") { (ins, _) => got2.synchronized { got2 ++= ins.map(_.getAs[Long]("big")) } }
    try {
      p.insert("grades", Seq(Row("Alex", 9L)))
      p.processAllAvailable()
      assert(got1.toSeq == Seq(90L))
      assert(got2.toSeq == Seq(90L))
      // ONE dedicated bus feed → exactly-once regardless of listen() count
      assert(viaBus.count(_ == 90L) == 1)
    } finally { q1.stop(); q2.stop(); p.close() }
  }

  test("bus delivers with zero listen() queries; second subscriber reuses the same feed") {
    val p = new StreamingPipeline(spark, PipelineConfig.fromYaml(yaml))
    val a = scala.collection.mutable.ArrayBuffer.empty[Long]
    val b = scala.collection.mutable.ArrayBuffer.empty[Long]
    p.listenBus.subscribe("derived") { (ins, _) =>
      a.synchronized { a ++= ins.map(_.getAs[Long]("curved")) }
    }
    p.listenBus.subscribe("derived") { (ins, _) =>
      b.synchronized { b ++= ins.map(_.getAs[Long]("curved")) }
    }
    try {
      p.insert("grades", Seq(Row("Alex", 95L)))
      p.processAllAvailable()
      assert(a.toSeq == Seq(100L))
      assert(b.toSeq == Seq(100L))
    } finally p.close()
  }

  test("bus feed restarts after close(); unknown table registers nothing") {
    val p = new StreamingPipeline(spark, PipelineConfig.fromYaml(yaml))
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    p.listenBus.subscribe("derived") { (ins, _) =>
      got.synchronized { got ++= ins.map(_.getAs[Long]("curved")) }
    }
    p.close() // stops the feed but keeps the subscriber
    // a new subscribe must restart the feed for BOTH subscribers
    p.listenBus.subscribe("derived") { (_, _) => () }
    try {
      p.insert("grades", Seq(Row("Alex", 95L)))
      p.processAllAvailable()
      assert(got.toSeq == Seq(100L))
      // a bad table name must throw BEFORE registering the callback
      assertThrows[IllegalArgumentException](
        p.listenBus.subscribe("no_such_table") { (_, _) => () })
    } finally p.close()
  }

  test("watermarked tumbling-window aggregation drops late data past the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Timestamp, Double)]
    val windowed = ms.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("value").cast("int").as("k"))
      .agg(count(lit(1)).as("cnt"))
    val q = windowed.writeStream.outputMode("update").format("memory")
      .queryName("wm_test").start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      ms.addData((t(10, 5), 1.0), (t(10, 20), 1.0))
      q.processAllAvailable()
      // advance event time far beyond 10:00 + watermark
      ms.addData((t(13, 0), 2.0))
      q.processAllAvailable()
      // this event is > 10 min behind the watermark → dropped
      ms.addData((t(10, 30), 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT k, max(cnt) AS cnt FROM wm_test GROUP BY k ORDER BY k")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(rows(1) == 2L) // late row did not bump the 10:00 window
      assert(rows(2) == 1L)
    } finally q.stop()
  }

  test("action transform in streaming mode") {
    ActionRegistry.register(GraftAction("streamMinus10",
      r => Row(r.getString(0), r.getLong(1) - 10),
      s => StructType(s.fields.filter(_.name != "_entryId"))))
    val yamlWithAction = yaml +
      """  - name: actionTest
        |    kind: action
        |    source_table: grades
        |    action: streamMinus10
        |""".stripMargin
    val p = new StreamingPipeline(spark, PipelineConfig.fromYaml(yamlWithAction))
    val got = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = p.listen("actionTest") { (ins, _) => got.synchronized { got ++= ins } }
    try {
      p.insert("grades", Seq(Row("Alex", 95L)))
      q.processAllAvailable()
      assert(got.length == 1)
      assert(got.head.getAs[Long]("grade") == 85L)
      assert(got.head.getAs[String]("_sourceEntryId").nonEmpty)
    } finally q.stop()
  }
}
