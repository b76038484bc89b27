package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's client-facing query surface over materialized tables
  * (reference: reactive_db/src/networking/network_types.rs:58-66, dispatch
  * db_thread.rs:52-113). Every operation compiles to a filter the optimizer
  * pushes into the parquet scan — the distributed analog of the reference's
  * mandatory per-column B-tree index.
  *
  * Quirk preserved for API fidelity: `greaterThan` is INCLUSIVE (>=), like
  * the reference's btree walk (reference: btree.rs:208-213). Range results
  * come back in ascending key order like the leaf-chain walk.
  */
final class QueryService(resolve: String => DataFrame) {

  def this(graph: PipelineGraph) = this(graph.table _)

  private def column(table: DataFrame, name: String): Column = {
    // match the reference's hard error on unknown/unindexed columns
    // (reference: storage_manager_table.rs:124-128)
    if (!table.columns.contains(name))
      throw new NoSuchElementException(s"No such column $name exists")
    col(name)
  }

  /** First entry with column == key (reference arbitrary-pick ≈ limit 1). */
  def findOne(table: String, col: String, key: Any): DataFrame = {
    val df = resolve(table)
    df.filter(column(df, col) === lit(key)).limit(1)
  }

  /** All entries with column == key. */
  def getAll(table: String, col: String, key: Any): DataFrame = {
    val df = resolve(table)
    df.filter(column(df, col) === lit(key))
  }

  /** Strict less-than, ascending key order (reference: btree.rs:225-259). */
  def lessThan(table: String, col: String, key: Any): DataFrame = {
    val df = resolve(table)
    df.filter(column(df, col) < lit(key)).orderBy(column(df, col).asc)
  }

  /** INCLUSIVE >= despite the name (reference: btree.rs:208-213). */
  def greaterThan(table: String, col: String, key: Any): DataFrame = {
    val df = resolve(table)
    df.filter(column(df, col) >= lit(key)).orderBy(column(df, col).asc)
  }
}
