package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch transform semantics against the reference's own fixtures
  * (reference: reactive_db/test_cfg.yaml, FIXTURES.md §A). */
class TransformsSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def sourceDf(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(rows.asJava, schema)

  private val testTableSchema = StructType(Seq(
    StructField("testForIndex", LongType), StructField("testForIteration", LongType),
    StructField("_entryId", StringType)))

  private def testTable(n: Int) = sourceDf(
    (0 until n).map(i => Row((i % 11).toLong, i.toLong, s"id-$i")), testTableSchema)

  test("FunctionTransform: newColumn ~ testForIteration + 2, only computed cols + lineage") {
    val out = Transforms.function(testTable(29), Seq("newColumn ~ testForIteration + 2"))
    assert(out.columns.toSeq == Seq("newColumn", "_sourceEntryId"))
    val m = out.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(m("id-15") == 17L) // database_test.rs:18-97 assertion
    assert(m.size == 29)
  }

  test("FilterTransform: (testForIndex < 11) && (testForIteration > 14) keeps all cols") {
    val out = Transforms.filter(testTable(29), "(testForIndex < 11) && (testForIteration > 14)")
    assert(out.columns.toSeq == Seq("testForIndex", "testForIteration", "_entryId", "_sourceEntryId"))
    val its = out.collect().map(_.getLong(1)).sorted
    assert(its.toSeq == (15L to 28L))
  }

  test("FilterTransform rejects non-boolean predicate") {
    assertThrows[IllegalArgumentException](
      Transforms.filter(testTable(3), "testForIteration + 2"))
  }

  test("UnionTransform: users ⊎ grades on name, incoming overwrites") {
    val users = sourceDf(Seq(Row("Alex", 22L, "u1"), Row("Bob", 30L, "u2")),
      StructType(Seq(StructField("name", StringType), StructField("age", LongType),
        StructField("_entryId", StringType))))
    val grades = sourceDf(Seq(Row("Alex", 95L, "g1"), Row("Cara", 80L, "g2")),
      StructType(Seq(StructField("name", StringType), StructField("grade", LongType),
        StructField("_entryId", StringType))))
    val out = Transforms.union(Seq((users, "name"), (grades, "name")))
    assert(out.columns.contains("matchingKey"))
    val byKey = out.collect().map(r => r.getAs[String]("matchingKey") -> r).toMap
    assert(byKey.keySet == Set("Alex", "Bob", "Cara"))
    assert(byKey("Alex").getAs[Long]("age") == 22L)
    assert(byKey("Alex").getAs[Long]("grade") == 95L)
    assert(byKey("Bob").getAs[Any]("grade") == null)
  }

  test("AggregationTransform: count/sum/average memo fold per group") {
    val grades = sourceDf(
      Seq(Row("Alex", 90L, "g1"), Row("Alex", 80L, "g2"), Row("Bob", 70L, "g3")),
      StructType(Seq(StructField("name", StringType), StructField("grade", LongType),
        StructField("_entryId", StringType))))
    val out = Transforms.aggregation(grades, "name", Seq(
      "count ~ memo.count + 1",
      "sum ~ memo.sum + grade",
      "average ~ memo.sum / memo.count"))
    assert(out.columns.toSeq == Seq("aggregatedColumn", "count", "sum", "average"))
    val m = out.collect().map(r => r.getString(0) -> r).toMap
    assert(m("Alex").getAs[Long]("count") == 2L)
    assert(m("Alex").getAs[Long]("sum") == 170L)
    assert(m("Alex").getAs[Long]("average") == 85L) // integer division
    assert(m("Bob").getAs[Long]("average") == 70L)
  }

  test("AggregationTransform rejects non-decomposable memo folds") {
    val df = testTable(3)
    assertThrows[graft.expr.ExprTypeException](
      Transforms.aggregation(df, "testForIndex", Seq("x ~ memo.x * testForIteration")))
  }

  test("AggregationTransform rejects memo-only statement lists") {
    val df = testTable(3)
    assertThrows[graft.expr.ExprTypeException](
      Transforms.aggregation(df, "testForIndex", Seq("x ~ memo.x / memo.x")))
  }

  test("aggregationFold runs arbitrary order-dependent memo folds") {
    val df = sourceDf(
      Seq(Row(1L, 1L, 3.0, "a"), Row(1L, 2L, 5.0, "b"), Row(2L, 1L, 7.0, "c")),
      StructType(Seq(StructField("k", LongType), StructField("seq", LongType),
        StructField("v", DoubleType), StructField("_entryId", StringType))))
    // non-decomposable: run = memo.run * 2 + seq, folded in seq order
    val out = Transforms.aggregationFold(df, "k", Seq("run ~ memo.run * 2 + seq"), "seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=1: ((0*2)+1)=1 → ((1*2)+2)=4 ; k=2: 1
    assert(out == Map(1L -> 4L, 2L -> 1L))
  }

  test("aggregationFold matches the decomposable path for count/sum/avg") {
    val grades = sourceDf(
      Seq(Row("Alex", 90L, "g1"), Row("Alex", 80L, "g2"), Row("Bob", 70L, "g3")),
      StructType(Seq(StructField("name", StringType), StructField("grade", LongType),
        StructField("_entryId", StringType))))
    val stmts = Seq(
      "count ~ memo.count + 1",
      "sum ~ memo.sum + grade",
      "average ~ memo.sum / memo.count")
    val fast = Transforms.aggregation(grades, "name", stmts)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val fold = Transforms.aggregationFold(grades, "name", stmts, "_entryId")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(fast == fold)
  }

  test("aggregationFold promotes through backward memo-reference chains") {
    val df = sourceDf(
      Seq(Row(1L, 1L, "a"), Row(1L, 2L, "b")),
      StructType(Seq(StructField("k", LongType), StructField("seq", LongType),
        StructField("_entryId", StringType))))
    // promotion must flow d → c → b → a (one statement per inference pass)
    val out = Transforms.aggregationFold(df, "k", Seq(
      "a ~ memo.a + memo.b",
      "b ~ memo.b + memo.c",
      "c ~ memo.c + memo.d",
      "d ~ memo.d + 1.5"), "seq")
      .collect().head
    // Decimal-ness reaches `a` only after 4 inference passes (one
    // statement per pass through the chain) — the regression was a fixed
    // 3-pass loop leaving `a` as Long and silently truncating the fold
    assert(out.schema("a").dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
    assert(out.getDecimal(out.fieldIndex("d")).doubleValue() == 3.0)
  }

  test("aggregationFold promotes memo types (Integer init → Decimal)") {
    val df = sourceDf(
      Seq(Row(1L, 1L, "a"), Row(1L, 2L, "b")),
      StructType(Seq(StructField("k", LongType), StructField("seq", LongType),
        StructField("_entryId", StringType))))
    val out = Transforms.aggregationFold(df, "k", Seq("d ~ memo.d + 1.5"), "seq")
      .collect().head
    assert(out.getDecimal(1).doubleValue() == 3.0)
  }

  test("AggregationTransform accepts the commutative `term + memo.dest` form") {
    val grades = sourceDf(
      Seq(Row("Alex", 90L, "g1"), Row("Alex", 80L, "g2")),
      StructType(Seq(StructField("name", StringType), StructField("grade", LongType),
        StructField("_entryId", StringType))))
    val out = Transforms.aggregation(grades, "name", Seq("sum ~ grade + memo.sum"))
    assert(out.collect().head.getAs[Long]("sum") == 170L)
  }

  test("ActionTransform: row→row function drops failing rows") {
    ActionRegistry.register(GraftAction("gradeMinus10",
      r => Row(r.getString(0), r.getLong(1) - 10),
      s => StructType(s.fields.filter(_.name != "_entryId"))))
    val grades = sourceDf(Seq(Row("Alex", 95L, "g1"), Row(null, 80L, "g2")),
      StructType(Seq(StructField("name", StringType), StructField("grade", LongType),
        StructField("_entryId", StringType))))
    val out = Transforms.action(grades, ActionRegistry.get("gradeMinus10"))
    // reference workspace/test_action.py semantics: grade -= 10
    val rows = out.collect()
    assert(rows.length == 2)
    val alex = rows.find(_.getAs[String]("name") == "Alex").get
    assert(alex.getAs[Long]("grade") == 85L)
    assert(alex.getAs[String]("_sourceEntryId") == "g1")
  }
}
