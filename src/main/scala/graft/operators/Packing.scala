package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: concatenate documents in a
  * deterministic order into one token stream and cut it into fixed-length
  * training sequences, reporting for each document which sequences it
  * lands in. (The reference engine has no equivalent — this is part of
  * the training-data layer; the data model is SURVEY.md §1's documents
  * table.)
  *
  * The core primitive is a GLOBAL prefix sum, which a naive formulation
  * writes as one un-partitioned running-sum window — a single task over
  * the whole corpus, the canonical non-scalable plan. Here it is the
  * standard two-level scan: per-block partial sums (one map-side-combined
  * aggregation), a running sum over the BLOCK SUMMARY (rows = n/blockSize
  * — the only un-partitioned window, ~10^2..10^4 rows at 100 TB with the
  * default block size, never the corpus), then a per-block window joined
  * back via broadcast. Every corpus-sized stage is partitioned.
  */
object Packing {

  /** Exclusive prefix sum of `valCol` over the global `ordCol` order,
    * emitted as `outCol`. `ordCol` must be numeric, non-negative and
    * unique per row (a doc_id); `valCol` must be integral. Identical to
    * `sum(val) OVER (ORDER BY ord ROWS UNBOUNDED PRECEDING AND 1
    * PRECEDING)` — long addition is associative, so the block split does
    * not change results, only the plan.
    */
  def exclusivePrefixSum(df: DataFrame, ordCol: String, valCol: String,
      outCol: String = "start", blockSize: Long = 1L << 20): DataFrame = {
    require(blockSize > 0, "blockSize must be positive")
    val blk = df.withColumn("__blk", expr(s"$ordCol div $blockSize"))
    val bsums = blk.groupBy(col("__blk"))
      .agg(sum(col(valCol)).as("__bsum"))
    // The one ordered-global window: runs over block summaries only.
    val offW = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boffs = bsums
      .withColumn("__boff", coalesce(sum(col("__bsum")).over(offW), lit(0L)))
      .select(col("__blk").as("__ob"), col("__boff"))
    val inW = Window.partitionBy(col("__blk")).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blk.join(broadcast(boffs), col("__blk") === col("__ob"))
      .withColumn(outCol,
        col("__boff") + sum(col(valCol)).over(inW) - col(valCol))
      .drop("__blk", "__ob", "__boff")
  }

  /** GPT-style packing map: with documents concatenated in `idCol` order
    * and the stream cut into `seqLen`-token sequences, emit per document
    * its global `start_token` plus the first/last sequence index it
    * occupies and how many sequences it spans. Zero-token documents
    * occupy no sequence (NULL first/last, n_seqs = 0).
    *
    * The output is the packing PLAN: the writer that materializes packed
    * sequences groups by sequence index downstream; boundary documents
    * (n_seqs > 1) contribute a slice to each of their sequences.
    */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
      seqLen: Int, blockSize: Long = 1L << 20): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val n = col(nTokCol)
    exclusivePrefixSum(df, idCol, nTokCol, "start_token", blockSize)
      .withColumn("first_seq",
        when(n > 0, expr(s"start_token div $seqLen")))
      .withColumn("last_seq",
        when(n > 0, expr(s"(start_token + $nTokCol - 1) div $seqLen")))
      .withColumn("n_seqs",
        coalesce(col("last_seq") - col("first_seq") + 1, lit(0L)))
  }
}
