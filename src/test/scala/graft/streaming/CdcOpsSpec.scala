package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

/** Delete retraction through streaming aggregation — the CDC rendition of
  * the reference's delete cascade (database.rs:197-270). */
class CdcOpsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("name", StringType), StructField("grade", LongType),
    StructField("_op", StringType)))

  test("delete retracts exactly the contribution of the inserted row") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    val ms = MemoryStream[Row]
    val agg = CdcOps.aggregateWithRetraction(ms.toDF(), "name", Seq(
      "cnt ~ memo.cnt + 1",
      "sum ~ memo.sum + grade",
      "avg ~ memo.sum / memo.cnt"))
    val q = agg.writeStream.outputMode("update").format("memory")
      .queryName("cdc_agg").start()
    try {
      ms.addData(Row("Alex", 90L, "insert"), Row("Alex", 80L, "insert"), Row("Bob", 70L, "insert"))
      q.processAllAvailable()
      def latest() = spark.sql(
        "SELECT aggregatedColumn, cnt, sum, avg FROM cdc_agg").collect()
        .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.last }
      val m1 = latest()
      assert(m1("Alex").getLong(1) == 2L && m1("Alex").getLong(2) == 170L && m1("Alex").getLong(3) == 85L)

      // retraction: delete the 90-grade row (the reference's Delete cascade)
      ms.addData(Row("Alex", 90L, "delete"))
      q.processAllAvailable()
      val m2 = latest()
      assert(m2("Alex").getLong(1) == 1L && m2("Alex").getLong(2) == 80L && m2("Alex").getLong(3) == 80L)
      assert(m2("Bob").getLong(1) == 1L)
    } finally q.stop()
  }

  test("fully-retracted group emits a delete marker; null values contribute zero; post statements chain") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    val ms = MemoryStream[Row]
    val agg = CdcOps.aggregateWithRetraction(ms.toDF(), "name", Seq(
      "cnt ~ memo.cnt + 1",
      "sum ~ memo.sum + grade",
      "avg ~ memo.sum / memo.cnt",
      "avg2 ~ memo.avg * 2")) // post statement referencing a post dest
    val q = agg.writeStream.outputMode("update").format("memory")
      .queryName("cdc_ghost").start()
    try {
      // null grade: counts the row, contributes 0 to sum (batch parity)
      ms.addData(Row("Cara", 50L, "insert"), Row("Cara", null, "insert"))
      q.processAllAvailable()
      val live = spark.sql(
        "SELECT cnt, sum, avg2, _op FROM cdc_ghost WHERE aggregatedColumn = 'Cara'")
        .collect().last
      assert(live.getLong(0) == 2L && live.getLong(1) == 50L)
      assert(live.getLong(2) == 50L) // avg2 = (50/2)*2
      assert(live.getString(3) == "upsert")

      ms.addData(Row("Cara", 50L, "delete"), Row("Cara", null, "delete"))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT _op, cnt FROM cdc_ghost WHERE aggregatedColumn = 'Cara'").collect().last
      assert(last.getString(0) == "delete" && last.getLong(1) == 0L)
    } finally q.stop()
  }

  test("unknown _op values fail loudly instead of counting as inserts") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    val ms = MemoryStream[Row]
    val agg = CdcOps.aggregateWithRetraction(ms.toDF(), "name", Seq("cnt ~ memo.cnt + 1"))
    val q = agg.writeStream.outputMode("update").format("memory")
      .queryName("cdc_badop").start()
    try {
      ms.addData(Row("Alex", 1L, "update"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q.processAllAvailable())
      assert(e.getMessage.contains("unknown _op") ||
        Option(e.getCause).exists(_.getMessage.contains("unknown _op")))
    } finally q.stop()
  }

  test("input without _op errors") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException](
      CdcOps.aggregateWithRetraction(Seq(("a", 1L)).toDF("name", "grade"), "name",
        Seq("cnt ~ memo.cnt + 1")))
    assert(e.getMessage.contains("_op"))
  }

  test("non-decomposable statements are rejected") {
    import spark.implicits._
    val df = Seq(("a", 1L, "insert")).toDF("name", "grade", "_op")
    assertThrows[graft.expr.ExprTypeException](
      CdcOps.aggregateWithRetraction(df, "name", Seq("x ~ grade")))
  }
}
