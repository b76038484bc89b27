package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic data-mixture construction: per-group token-budget
  * sampling.
  *
  * A training-data pipeline rarely takes a corpus whole — it takes "w_s
  * tokens from source s" for a target mixture (Pile-style source weighting;
  * DoReMi, arXiv:2305.10429, optimizes exactly these per-domain token
  * budgets). Given a per-row token count, a per-group budget table, and a
  * deterministic priority (e.g. a hash of the id — NOT arrival order,
  * which is nondeterministic at scale), this selects rows in priority
  * order within each group until the group's token budget is exhausted:
  * `picked = running_sum(tokens) <= budget` (a row that would cross the
  * budget boundary is excluded, as is everything after it).
  *
  * Scale path: the running sum is [[PrefixSum.groupedRunningSum]] — a
  * corpus-sized group ("all of src_web") never lands on one reducer, which
  * is precisely where the naive `Window.partitionBy(source)` dies at
  * 100 TB. The budget table is group-cardinality-sized and broadcast.
  */
object MixtureSample {

  /** @param df          rows to sample; must contain `groupCol`,
    *                    `tokenCol`, `priorityCol`
    * @param groupCol    mixture component key (e.g. source/domain)
    * @param tokenCol    per-row token count (non-negative long)
    * @param priorityCol deterministic selection order within a group;
    *                    numeric, non-null, unique per group (PrefixSum
    *                    requirement — ties would make the prefix ambiguous)
    * @param budgets     one row per group: (budgetGroupCol, budgetCol).
    *                    Groups ABSENT from this table are dropped entirely
    *                    (inner join) — an unlisted source is "not in the
    *                    mixture", not "unlimited"
    * @return the budgeted groups' rows plus a `picked` boolean; rows are
    *         kept whether picked or not so callers can audit what the
    *         budget excluded
    */
  def tokenBudgetSample(df: DataFrame, groupCol: String, tokenCol: String,
                        priorityCol: String, budgets: DataFrame,
                        budgetGroupCol: String, budgetCol: String): DataFrame = {
    val cum = PrefixSum.groupedRunningSum(df, Seq(groupCol), priorityCol, tokenCol, "__cum")
    cum.join(
        broadcast(budgets.select(col(budgetGroupCol).as(groupCol), col(budgetCol).as("__budget"))),
        Seq(groupCol))
      .withColumn("picked", col("__cum") <= col("__budget"))
      .drop("__cum", "__budget")
  }
}
