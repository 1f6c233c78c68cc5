package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-side scale patterns beyond what Catalyst injects on its own.
  *
  * The flagship here is the explicit bloom-prefiltered semi join: Spark's
  * own runtime bloom filter (`spark.sql.optimizer.runtime.bloomFilter.*`,
  * PlanSpec-covered) only fires on heuristics; this operator GUARANTEES the
  * probe side is thinned before its shuffle, which at 100 TB is the
  * difference between shuffling the whole fact table and shuffling only the
  * rows that can possibly match. Exactness is preserved because every bloom
  * survivor is re-checked by a real semi join — false positives cost I/O,
  * never correctness.
  */
object Joins {

  /** Exact semi join with a bloom prefilter on the probe side.
    *
    * Build: the (distinct) build keys are folded into ONE bloom filter via
    * `BloomFilterAggregate` — a single small binary to the driver (~1.2
    * bytes/key at the default fpp), same index-build action shape as
    * `TextAnalysis.decontaminateBloom`. Probe: one map-only
    * `might_contain` pass drops the clean majority BEFORE any shuffle;
    * only survivors enter the exact LEFT SEMI confirm against the key set.
    * SHUFFLE_HASH on the confirm because this path is chosen exactly when
    * the build side may be too big to broadcast.
    *
    * NULL probe keys never match (standard semi-join semantics).
    *
    * Sizing: the filter costs ~1 byte per expected key (8 bits/key at the
    * chosen numBits) on the driver and in each task's closure. That holds
    * to ~100M build keys (≲100 MB broadcast); past that, prefer Spark's
    * own runtime bloom injection or a plain shuffled semi join — the
    * crossover is when the filter broadcast rivals the probe shuffle it
    * saves.
    */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedKeys: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(expectedKeys > 0)
    val keys = build.select(col(buildKey).as("__bk"))
      .filter(col("__bk").isNotNull).distinct()
    val bloomAgg = Bridge.toColumn(new BloomFilterAggregate(
        new XxHash64(Seq(Bridge.toExpression(col("__bk")))),
        Literal(expectedKeys), Literal(8L * expectedKeys))
      .toAggregateExpression())
    val bloomBytes = keys.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    if (bloomBytes == null) return probe.limit(0) // empty build side
    val mightContain = Bridge.toColumn(BloomFilterMightContain(
      Literal.create(bloomBytes, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(Bridge.toExpression(col(probeKey))))))
    probe.filter(col(probeKey).isNotNull && mightContain)
      .join(keys.hint("SHUFFLE_HASH"),
        col(probeKey) === col("__bk"), "left_semi")
  }
}
