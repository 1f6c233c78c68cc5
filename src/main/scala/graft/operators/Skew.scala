package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md "salting for skew" / AQE notes).
  *
  * At 100 TB a handful of hot keys (one boilerplate doc hash, one megauser)
  * can pin a whole stage on one task. Two standing answers:
  *  - AQE skew-join splitting (on by default in GraftSession) for joins;
  *  - explicit two-stage salted aggregation below, for aggregates whose
  *    partial state is reassociable (sum/count/min/max): stage 1 groups on
  *    (key, salt) spreading each hot key over `buckets` tasks, stage 2
  *    re-aggregates the partials per key. The result is independent of the
  *    salt, so correctness is oracle-checkable against the plain GROUP BY.
  */
object Skew {

  /** Two-stage salted sum+count: (key, sum_<name>, n) — sums are
    * re-aggregated partials, so the output equals the plain GROUP BY.
    *
    * @param saltExpr deterministic bucketing expression (any value works —
    *                 results are salt-independent; a deterministic one keeps
    *                 runs reproducible)
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: Column,
      name: String, saltExpr: Column, buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(saltExpr, lit(buckets)))
    salted.groupBy(col(keyCol), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pn"))
      .groupBy(col(keyCol))
      .agg(sum(col("__psum")).as(name), sum(col("__pn")).as("n"))
  }

  /** Broadcast-salt join for a skewed left key against a small-ish right
    * side: right rows are replicated `buckets` times, left rows pick one
    * replica — each hot left key spreads over `buckets` tasks. Use when the
    * right side is too big to broadcast whole but its replication factor
    * fits (|R| * buckets << |L|).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltExpr: Column, buckets: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(saltExpr, lit(buckets)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
