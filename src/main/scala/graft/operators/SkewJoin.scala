package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-handling join primitives for pathological key
  * distributions (a handful of keys holding a large fraction of rows —
  * the usual shape of web-corpus joins at 100 TB).
  *
  * AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin`,
  * enabled by GraftSession) handles moderate skew transparently; salting
  * is the explicit primitive for when one reducer's key is too hot even
  * split — it trades `salts`× replication of the small side for an even
  * spread of the hot key across `salts` reducers.
  */
object SkewJoin {

  /** Salted equi-join on a shared key column: each large-side row gets a
    * per-row salt and the small right side is replicated once per salt.
    * The salt comes from `monotonically_increasing_id()` so even FULLY
    * DUPLICATE hot-key rows (the common shape in dedup corpora, where a
    * content hash would collapse them onto one reducer) spread evenly;
    * salt values only route rows, so the join RESULT stays row-identical
    * to `left.join(right, Seq(key), joinType)` regardless of assignment.
    * Supported joinType: inner / left (right-side replication breaks
    * right/full-outer semantics — use AQE skew handling there). */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"saltedEquiJoin supports inner/left joins, got $joinType")
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1), lit(1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
