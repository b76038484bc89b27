package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip property for the wire codec: for random rows over the
  * reference's type surface (Integer/Str/Bool/Decimal/Float/Array/Map —
  * communication_types.py:22-38), `parseEntry(toTaggedJson(row)) == row`
  * with the schema preserved. */
class TaggedJsonPropertySpec extends AnyFunSuite {

  private val leafTypes: Gen[DataType] = Gen.oneOf(
    LongType, StringType, BooleanType, DoubleType, DecimalType(38, 18))

  private def valueFor(dt: DataType): Gen[Any] = dt match {
    case LongType    => Gen.choose(-1000000L, 1000000L)
    case StringType  => Gen.alphaNumStr.map(_.take(12))
    case BooleanType => Gen.oneOf(true, false)
    case DoubleType  => Gen.choose(-1000.0, 1000.0).map(v => math.rint(v * 100) / 100)
    case _: DecimalType =>
      Gen.choose(-999999L, 999999L).map(v =>
        new java.math.BigDecimal(v).movePointLeft(3).setScale(18))
    case ArrayType(et, _) => Gen.listOfN(3, valueFor(et)).map(_.toSeq)
    case st: StructType =>
      Gen.sequence[Seq[Any], Any](st.fields.toSeq.map(f => valueFor(f.dataType)))
        .map(Row.fromSeq)
    case other => sys.error(s"no generator for $other")
  }

  private val fieldType: Gen[DataType] = Gen.frequency(
    4 -> leafTypes,
    1 -> leafTypes.map(ArrayType(_)),
    1 -> leafTypes.map(t => StructType(Seq(
      StructField("x", t), StructField("y", StringType)))))

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 5)
    types <- Gen.listOfN(n, fieldType)
  } yield StructType(types.zipWithIndex.map { case (t, i) => StructField(s"c$i", t) })

  private val rowGen: Gen[(StructType, Row)] = for {
    schema <- schemaGen
    values <- Gen.sequence[Seq[Any], Any](schema.fields.toSeq.map(f => valueFor(f.dataType)))
  } yield (schema, Row.fromSeq(values))

  test("toTaggedJson → parseEntry round-trips rows and schemas") {
    val prop = Prop.forAll(rowGen) { case (schema, row) =>
      val json = TaggedJson.toTaggedJson(row, schema)
      val (gotSchema, gotRow) = TaggedJson.parseEntry(json)
      // parse maps Integer→Long, Float→Double, Decimal→(38,18): the same
      // types we serialized from, so both sides must agree exactly
      gotSchema == schema && gotRow == row
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(80), prop)
    assert(res.passed, res.status.toString)
  }
}
