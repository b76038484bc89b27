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
