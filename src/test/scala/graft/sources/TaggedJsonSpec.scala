package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TaggedJsonSpec extends AnyFunSuite {

  test("parses the reference's wire frames (test_requests.txt shapes)") {
    val (schema, row) = TaggedJson.parseEntry(
      """{"testForIndex": {"Integer": 1}, "testForIteration": {"Integer": 2}}""")
    assert(schema == StructType(Seq(
      StructField("testForIndex", LongType), StructField("testForIteration", LongType))))
    assert(row == Row(1L, 2L))
  }

  test("all tags round-trip: Integer/Str/Bool/Decimal/Float/Array/Map") {
    val json =
      """{"i": {"Integer": 5}, "s": {"Str": "x"}, "b": {"Bool": true},
         "d": {"Decimal": "1.5"}, "f": {"Float": 2.25},
         "a": {"Array": [{"Integer": 1}, {"Integer": 2}]},
         "m": {"Map": {"inner": {"Str": "y"}}}}"""
    val (schema, row) = TaggedJson.parseEntry(json)
    assert(schema("i").dataType == LongType)
    assert(schema("d").dataType == DecimalType(38, 18))
    assert(schema("a").dataType == ArrayType(LongType))
    assert(schema("m").dataType == StructType(Seq(StructField("inner", StringType))))
    assert(row.getSeq[Long](5) == Seq(1L, 2L))
    val back = TaggedJson.toTaggedJson(row, schema)
    val (schema2, row2) = TaggedJson.parseEntry(back)
    assert(schema2 == schema)
    assert(row2.toSeq.zip(row.toSeq).forall {
      case (a: java.math.BigDecimal, b: java.math.BigDecimal) => a.compareTo(b) == 0
      case (a, b) => a == b
    })
  }

  test("mismatched columns across entries error like the reference") {
    val e = intercept[IllegalArgumentException](TaggedJson.parseEntries(Seq(
      """{"a": {"Integer": 1}}""", """{"b": {"Integer": 2}}""")))
    assert(e.getMessage.contains("Missmatched Input"))
  }

  test("mismatched TYPES across entries error; empty arrays stay compatible") {
    val e = intercept[IllegalArgumentException](TaggedJson.parseEntries(Seq(
      """{"a": {"Integer": 1}}""", """{"a": {"Str": "x"}}""")))
    assert(e.getMessage.contains("Missmatched Input"))
    // an empty Array has no element to infer a type from — it must remain
    // accepted against any array column
    val (schema, rows) = TaggedJson.parseEntries(Seq(
      """{"xs": {"Array": [{"Integer": 1}]}}""", """{"xs": {"Array": []}}"""))
    assert(schema("xs").dataType == ArrayType(LongType))
    assert(rows(1).getSeq[Any](0).isEmpty)
    // ...but a NON-empty array<string> against array<bigint> is a genuine
    // type conflict and must fail at parse time, not materialization
    val e2 = intercept[IllegalArgumentException](TaggedJson.parseEntries(Seq(
      """{"xs": {"Array": [{"Integer": 1}]}}""",
      """{"xs": {"Array": [{"Str": "x"}]}}""")))
    assert(e2.getMessage.contains("Missmatched Input"))
    // an empty array in the FIRST entry fixes the column at array<string>:
    // later array<string> passes, later array<bigint> fails
    val (s3, _) = TaggedJson.parseEntries(Seq(
      """{"xs": {"Array": []}}""", """{"xs": {"Array": [{"Str": "x"}]}}"""))
    assert(s3("xs").dataType == ArrayType(StringType))
    assertThrows[IllegalArgumentException](TaggedJson.parseEntries(Seq(
      """{"xs": {"Array": []}}""", """{"xs": {"Array": [{"Integer": 1}]}}""")))
  }

  test("empty-array wildcard applies inside nested Map structs too") {
    // the compat check recurses into struct fields: an empty array nested
    // in a Map stays compatible with the first entry's typed array...
    val (schema, rows) = TaggedJson.parseEntries(Seq(
      """{"m": {"Map": {"xs": {"Array": [{"Integer": 1}]}}}}""",
      """{"m": {"Map": {"xs": {"Array": []}}}}"""))
    val st = schema("m").dataType.asInstanceOf[StructType]
    assert(st("xs").dataType == ArrayType(LongType))
    assert(rows(1).getStruct(0).getSeq[Any](0).isEmpty)
    // ...but a nested non-empty type conflict still fails at parse time
    val e = intercept[IllegalArgumentException](TaggedJson.parseEntries(Seq(
      """{"m": {"Map": {"xs": {"Array": [{"Integer": 1}]}}}}""",
      """{"m": {"Map": {"xs": {"Array": [{"Str": "x"}]}}}}""")))
    assert(e.getMessage.contains("Missmatched Input"))
  }

  test("unknown tag errors") {
    assertThrows[IllegalArgumentException](
      TaggedJson.parseEntry("""{"a": {"Nope": 1}}"""))
  }

  test("nulls omitted on serialize") {
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val json = TaggedJson.toTaggedJson(Row(1L, null), schema)
    assert(json == """{"a":{"Integer":1}}""")
  }
}
