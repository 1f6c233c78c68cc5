package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.CrossHash._

/** Corpus sampling operators for LLM training-data pipelines (north-star
  * layer): deterministic content-hash sampling shapes that rebalance a
  * multi-domain corpus. Complements the inline hash/stratified sampling
  * queries (t06/t10/d07): here the RATES themselves are computed from the
  * corpus, not supplied.
  */
object Sampling {

  /** Temperature-based domain mixture sampling — the standard multinomial
    * rebalancing for multi-domain/multilingual corpora: sample domain d
    * with probability p_d ∝ n_d^alpha (alpha < 1 upweights small
    * domains), scaled to an expected `budget` of kept docs, capped at
    * rate 1 (this operator subsamples; it never repeats docs).
    * Membership is a content-hash test, so the sample is engine- and
    * rerun-reproducible, and a doc's fate never depends on partitioning.
    *
    * Output: every input row + (sample_rate DOUBLE, keep BOOLEAN).
    *
    * Bit-reproducibility: with the default alpha = 0.5 the weight is
    * sqrt(n) — correctly rounded under IEEE 754, so identical on every
    * engine — rounded HALF_UP to DECIMAL(18,6) (the rounding Spark's
    * decimal cast applies) so the cross-domain sum is exact and
    * order-free; the remaining arithmetic is a fixed chain of single
    * double ops. Any other alpha goes through pow(), whose last ulp is
    * implementation-defined — fine within Spark, but not oracle-exact
    * across engines.
    *
    * NULL handling: a NULL domain is a domain of its own (null-safe
    * join, so every input row really does come back); a NULL textCol
    * yields keep = false, never NULL.
    *
    * Scale: one count-by-domain aggregation (tiny result — one row per
    * domain), a 1-row total cross-joined back, and a broadcast join of
    * the rate table onto the corpus — the corpus itself is touched by
    * exactly one map pass.
    */
  def temperatureMixture(docs: DataFrame, domainCol: String, budget: Long,
      alpha: Double = 0.5, textCol: String = "text",
      seed: String = "mix"): DataFrame = {
    require(budget > 0 && alpha > 0 && alpha <= 1)
    val dec6 = DecimalType(18, 6)
    val wgt = if (alpha == 0.5) sqrt(col("__n"))
              else pow(col("__n"), lit(alpha))
    val stats = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__sq", wgt.cast(dec6))
    val tot = stats.agg(sum(col("__sq")).as("__tot"))
    val p = col("__sq").cast("double") / col("__tot").cast("double")
    val rate = least(lit(1.0),
      lit(budget.toDouble) * p / col("__n").cast("double"))
    val rates = stats.crossJoin(broadcast(tot))
      .select(col(domainCol).as("__dom"), rate.as("sample_rate"),
        floor(rate * lit(1e6)).cast("long").as("__thr"))
    docs.join(broadcast(rates), col(domainCol) <=> col("__dom"))
      .withColumn("keep", coalesce(
        md5Long(concat(lit(seed + ":"), col(textCol))) % 1000000L
          < col("__thr"), lit(false)))
      .drop("__thr", "__dom")
  }
}
