package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** The reference's externally-tagged JSON wire encoding for rows
  * (reference: reactive_db_python_client/reactive_db_client/
  * communication_types.py:22-38, sample frames reactive_db/
  * test_requests.txt:1-3):
  *
  * {{{ {"testForIndex": {"Integer": 1}, "name": {"Str": "John"}} }}}
  *
  * Tags: Integer, Str, Bool, ID, Decimal (string payload), Float,
  * Array (list payload), Map (nested tagged object → struct).
  * This codec gives a client of the reference a drop-in data path into the
  * Spark engine: parse tagged rows at ingest, emit tagged rows from
  * committed edits / listen events.
  */
object TaggedJson {
  private val mapper = new ObjectMapper()

  /** Spark type for a tagged value. */
  def dataTypeOf(tag: String, payload: JsonNode): DataType = tag match {
    case "Integer" => LongType
    case "Str" | "ID" => StringType
    case "Bool" => BooleanType
    case "Decimal" => DecimalType(38, 18)
    case "Float" => DoubleType
    case "Array" =>
      val elems = payload.asInstanceOf[ArrayNode]
      if (elems.size() == 0) ArrayType(StringType)
      else {
        val f = elems.get(0).fields().next()
        ArrayType(dataTypeOf(f.getKey, f.getValue))
      }
    case "Map" =>
      StructType(payload.fields().asScala.map { e =>
        val f = e.getValue.fields().next()
        StructField(e.getKey, dataTypeOf(f.getKey, f.getValue))
      }.toSeq)
    case other => throw new IllegalArgumentException(s"unknown tag $other")
  }

  private def valueOf(tag: String, payload: JsonNode): Any = tag match {
    case "Integer" => payload.asLong()
    case "Str" | "ID" => payload.asText()
    case "Bool" => payload.asBoolean()
    case "Decimal" => new java.math.BigDecimal(payload.asText())
    case "Float" => payload.asDouble()
    case "Array" =>
      payload.asInstanceOf[ArrayNode].elements().asScala.map { el =>
        val f = el.fields().next(); valueOf(f.getKey, f.getValue)
      }.toSeq
    case "Map" =>
      Row.fromSeq(payload.fields().asScala.map { e =>
        val f = e.getValue.fields().next(); valueOf(f.getKey, f.getValue)
      }.toSeq)
    case other => throw new IllegalArgumentException(s"unknown tag $other")
  }

  /** Parse one tagged entry into (schema, row). Column order follows the
    * JSON object order (the reference's Entry is an ordered map). */
  def parseEntry(json: String): (StructType, Row) = {
    val node = mapper.readTree(json).asInstanceOf[ObjectNode]
    val fields = node.fields().asScala.toSeq.map { e =>
      val f = e.getValue.fields().next()
      (StructField(e.getKey, dataTypeOf(f.getKey, f.getValue)), valueOf(f.getKey, f.getValue))
    }
    (StructType(fields.map(_._1)), Row.fromSeq(fields.map(_._2)))
  }

  /** Parse many entries sharing a schema (first entry defines it — the
    * reference's first-row inference, storage_manager_table.rs:334-350). */
  def parseEntries(jsons: Seq[String]): (StructType, Seq[Row]) = {
    require(jsons.nonEmpty, "no entries")
    val (schema, first) = parseEntry(jsons.head)
    val rest = jsons.tail.map { j =>
      val (s2, r) = parseEntry(j)
      require(s2.fieldNames.sameElements(schema.fieldNames),
        s"Missmatched Input: ${s2.fieldNames.mkString(",")} vs ${schema.fieldNames.mkString(",")}")
      // tags/types must agree too — a Str where the first entry had an
      // Integer would otherwise surface later as an opaque encoder
      // ClassCastException at materialization instead of at parse time.
      // Exception: an EMPTY Array has no element to infer from (dataTypeOf
      // defaults it to array<string>), so it is compatible with any array
      // column — its value (empty Seq) materializes under any element type.
      def compatible(got: DataType, want: DataType): Boolean = (got, want) match {
        case (g, w) if g == w => true
        case (ArrayType(StringType, _), ArrayType(_, _)) => true
        case _ => false
      }
      s2.fields.zip(schema.fields).foreach { case (got, want) =>
        require(compatible(got.dataType, want.dataType),
          s"Missmatched Input: column ${want.name} is ${want.dataType.simpleString} " +
            s"but entry has ${got.dataType.simpleString}")
      }
      r
    }
    (schema, first +: rest)
  }

  private def tagFor(dt: DataType, v: Any): (String, Any) = dt match {
    case ByteType | ShortType | IntegerType | LongType => ("Integer", v)
    case StringType => ("Str", v)
    case BooleanType => ("Bool", v)
    case _: DecimalType => ("Decimal", v.toString)
    case FloatType | DoubleType => ("Float", v)
    case ArrayType(et, _) => ("Array", (et, v))
    case st: StructType => ("Map", (st, v))
    case other => throw new IllegalArgumentException(s"cannot encode $other")
  }

  private def writeTagged(node: ObjectNode, dt: DataType, v: Any): Unit = {
    val (tag, payload) = tagFor(dt, v)
    tag match {
      case "Integer" => node.put(tag, payload.asInstanceOf[Number].longValue())
      case "Str" => node.put(tag, payload.asInstanceOf[String])
      case "Bool" => node.put(tag, payload.asInstanceOf[Boolean])
      case "Decimal" => node.put(tag, payload.asInstanceOf[String])
      case "Float" => node.put(tag, payload.asInstanceOf[Number].doubleValue())
      case "Array" =>
        val (et, seq) = payload.asInstanceOf[(DataType, Any)]
        val arr = node.putArray(tag)
        seq.asInstanceOf[Seq[Any]].foreach { el =>
          writeTagged(arr.addObject(), et, el)
        }
      case "Map" =>
        val (st, row) = payload.asInstanceOf[(StructType, Any)]
        val obj = node.putObject(tag)
        st.fields.zip(row.asInstanceOf[Row].toSeq).foreach { case (f, fv) =>
          writeTagged(obj.putObject(f.name), f.dataType, fv)
        }
    }
  }

  /** Serialize a row to the tagged wire format (nulls omitted, like the
    * reference's sparse entries). */
  def toTaggedJson(row: Row, schema: StructType): String = {
    val node = mapper.createObjectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) writeTagged(node.putObject(f.name), f.dataType, row.get(i))
    }
    mapper.writeValueAsString(node)
  }
}
