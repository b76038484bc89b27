package graft.config

import org.apache.spark.sql.types._
import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** Pipeline configuration ADT mirroring the reference's YAML config surface
  * (reference: reactive_db/src/config/config_reader.rs:8-85), re-expressed
  * for a Spark engine.
  */
sealed trait TableConfig { def name: String }

/** Source table: fixed declared schema; direct insert target
  * (reference: config_reader.rs:21-24). */
final case class SourceTableConfig(name: String, columns: Seq[(String, DataType)]) extends TableConfig

sealed trait DerivedTableConfig extends TableConfig { def inputTables: Seq[String] }

/** `dest ~ expr` projection; output contains ONLY computed columns +
  * lineage (reference: config_reader.rs:41-44). */
final case class FunctionTableConfig(name: String, sourceTable: String, functions: Seq[String])
    extends DerivedTableConfig { def inputTables: Seq[String] = Seq(sourceTable) }

/** Boolean predicate; passing rows keep all source columns + lineage
  * (reference: config_reader.rs:52-55). */
final case class FilterTableConfig(name: String, sourceTable: String, filter: String)
    extends DerivedTableConfig { def inputTables: Seq[String] = Seq(sourceTable) }

/** Key-coalescing n-way outer merge (upsert by matchingKey)
  * (reference: config_reader.rs:47-49). */
final case class UnionTableConfig(name: String, tablesAndForeignKeys: Seq[(String, String)])
    extends DerivedTableConfig { def inputTables: Seq[String] = tablesAndForeignKeys.map(_._1) }

/** Per-group memo fold, upsert one row per group
  * (reference: config_reader.rs:58-62). */
final case class AggregationTableConfig(
    name: String, sourceTable: String, aggregatedColumn: String, functions: Seq[String])
    extends DerivedTableConfig { def inputTables: Seq[String] = Seq(sourceTable) }

/** Named row→row UDF from the action registry
  * (reference: config_reader.rs:63-79). */
final case class ActionTableConfig(name: String, sourceTable: String, actionName: String)
    extends DerivedTableConfig { def inputTables: Seq[String] = Seq(sourceTable) }

final case class PipelineConfig(tables: Seq[TableConfig]) {
  def byName: Map[String, TableConfig] = tables.map(t => t.name -> t).toMap

  /** Topological order over the table DAG (sources first). */
  def topoOrder: Seq[TableConfig] = {
    val by = byName
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    def visit(n: String, stack: Set[String]): Unit = {
      if (seen.contains(n)) return
      if (stack.contains(n)) throw new IllegalArgumentException(s"cycle at table $n")
      by.get(n) match {
        case Some(d: DerivedTableConfig) =>
          d.inputTables.foreach { in =>
            if (!by.contains(in))
              throw new IllegalArgumentException(
                s"table ${d.name} reads from undeclared table $in")
            visit(in, stack + n)
          }
        case Some(_) =>
        case None => // unreferenced name at the root loop — caller's tables only
      }
      seen += n
    }
    tables.foreach(t => visit(t.name, Set.empty))
    seen.toSeq.flatMap(by.get)
  }
}

object PipelineConfig {
  /** Reference DataType name → Spark type (SURVEY.md §1.2). */
  def dataType(s: String): DataType = s.trim.toLowerCase match {
    case "integer" => LongType
    case "str" | "string" => StringType
    case "bool" | "boolean" => BooleanType
    case "id" => StringType
    case "decimal" => DecimalType(38, 18)
    case "float" | "double" => DoubleType
    case a if a.startsWith("array<") && a.endsWith(">") =>
      ArrayType(dataType(a.stripPrefix("array<").stripSuffix(">")))
    case other => throw new IllegalArgumentException(s"unknown type $other")
  }

  /** Parse a YAML pipeline config. Shape (one mapping per table):
    * {{{
    * tables:
    *   - name: testTable
    *     kind: source
    *     columns: {testForIndex: Integer, testForIteration: Integer}
    *   - name: derived
    *     kind: function
    *     source_table: testTable
    *     functions: ["newColumn ~ testForIteration + 2"]
    *   - name: filterTest
    *     kind: filter
    *     source_table: testTable
    *     filter: "(testForIndex < 11) && (testForIteration > 14)"
    *   - name: unionTest
    *     kind: union
    *     tables_and_foreign_keys: [[users, name], [grades, name]]
    *   - name: aggregationTest
    *     kind: aggregation
    *     source_table: grades
    *     aggregated_column: name
    *     functions: ["count ~ memo.count + 1", "sum ~ memo.sum + grade"]
    *   - name: actionTest
    *     kind: action
    *     source_table: grades
    *     action: test_action
    * }}}
    */
  def fromYaml(yaml: String): PipelineConfig = {
    val root = new Yaml().load[java.util.Map[String, Object]](yaml)
    val tables = root.get("tables").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
    PipelineConfig(tables.asScala.toSeq.map(parseTable))
  }

  private def parseTable(m: java.util.Map[String, Object]): TableConfig = {
    def str(k: String): String = Option(m.get(k)).map(_.toString)
      .getOrElse(throw new IllegalArgumentException(s"missing key $k in $m"))
    def strList(k: String): Seq[String] =
      m.get(k).asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString)
    val name = str("name")
    str("kind") match {
      case "source" =>
        val cols = m.get("columns").asInstanceOf[java.util.Map[String, Object]]
        SourceTableConfig(name, cols.asScala.toSeq.map { case (c, t) => c -> dataType(t.toString) })
      case "function" => FunctionTableConfig(name, str("source_table"), strList("functions"))
      case "filter"   => FilterTableConfig(name, str("source_table"), str("filter"))
      case "union" =>
        val pairs = m.get("tables_and_foreign_keys").asInstanceOf[java.util.List[java.util.List[Object]]]
        UnionTableConfig(name, pairs.asScala.toSeq.map(p => (p.get(0).toString, p.get(1).toString)))
      case "aggregation" =>
        AggregationTableConfig(name, str("source_table"), str("aggregated_column"), strList("functions"))
      case "action" => ActionTableConfig(name, str("source_table"), str("action"))
      case other    => throw new IllegalArgumentException(s"unknown table kind $other")
    }
  }
}
