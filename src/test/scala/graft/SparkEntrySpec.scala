package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract drift guards: every query the driver runs must be
  * oracle-gated, and the two maps must never diverge silently. */
class SparkEntrySpec extends AnyFunSuite {

  test("every queries entry has an oracleSql entry (full gate, no rows-only fallbacks)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries without an oracle: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"oracles without a query: ${o.diff(q).toSeq.sorted}")
  }

  test("every oracle has a deterministic total ORDER BY (single-row queries exempt)") {
    // q07 is FindOne, q110 a global regression, q123/q130 cross joins of
    // 1-row aggregates, q167 a global aggregate: one row by
    // construction, nothing to order
    val exempt = Set("q07_find_one", "q110_zipf_fit", "q123_cms_join_size",
      "q130_hll_distinct", "q167_zorder_scan")
    val missing = SparkEntry.oracleSql.collect {
      case (name, sql) if !exempt(name) && !sql.toUpperCase.contains("ORDER BY") => name
    }
    assert(missing.isEmpty, s"oracles without ORDER BY: ${missing.toSeq.sorted}")
  }
}
