package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * standard two-level scan, with blocks defined by RANGE PARTITION, not
  * by id arithmetic: `ordCol div blockSize` blocking would tie the
  * block-summary size to the id VALUE RANGE (sparse or hashed ids — the
  * repo's own content-hash sharding convention — degenerate to one block
  * per row, and the summary becomes corpus-sized). Range partitioning
  * keeps the summary at exactly `numBlocks` rows regardless of id
  * distribution: per-block partial sums (map-side combined), a running
  * sum over those `numBlocks` summary rows (the only un-partitioned
  * window), then a per-block window joined back via broadcast. Every
  * corpus-sized stage is partitioned.
  */
object Packing {

  /** Sentinel default for `numBlocks`: resolve to 4× the cluster's
    * default parallelism (floor 16) at plan time. Blocks then size like
    * shuffle partitions — per-core block volume stays constant as the
    * cluster grows, where any FIXED count either drowns a laptop in
    * tasks or leaves a 1000-executor cluster with corpus-sized blocks.
    * Pass an explicit positive value to pin the layout; the OUTPUT is
    * numBlocks-invariant either way (PackingSpec proves it), only the
    * plan changes.
    */
  val AdaptiveBlocks: Int = 0

  private def resolveBlocks(df: DataFrame, numBlocks: Int): Int =
    if (numBlocks > 0) numBlocks
    else math.max(df.sparkSession.sparkContext.defaultParallelism * 4, 16)

  /** Exclusive prefix sum of `valCol` over the global `ordCol` order,
    * emitted as `outCol`. `ordCol` must be orderable, non-null and
    * unique per row (a doc_id); `valCol` must be integral. Identical to
    * `sum(val) OVER (ORDER BY ord ROWS UNBOUNDED PRECEDING AND 1
    * PRECEDING)` for ANY `numBlocks` — long addition is associative, so
    * the block split changes only the plan, never the values.
    *
    * `numBlocks` bounds the un-partitioned window's input (one row per
    * block) AND sets the scan's parallelism; size it like you would size
    * shuffle partitions for the corpus (the range boundaries come from
    * Spark's standard sampling, so blocks are balanced by ROW COUNT, not
    * id arithmetic).
    */
  def exclusivePrefixSum(df: DataFrame, ordCol: String, valCol: String,
      outCol: String = "start", numBlocks: Int = AdaptiveBlocks): DataFrame =
    exclusivePrefixSumBy(df, Seq(col(ordCol)), valCol, outCol, numBlocks)

  /** [[exclusivePrefixSum]] over an arbitrary composite sort order
    * (e.g. `Seq(col("rev").desc, col("l_partkey"))` for a Pareto
    * ranking). `ordExprs` must define a TOTAL order (include a unique
    * tie-breaker column) — range partitioning and the in-block window
    * both honor the full sort-expression list, so blocks stay contiguous
    * intervals of the composite order and the two-level scan reproduces
    * the single global window's values exactly for any `numBlocks`.
    *
    * `totCol`: when set, the GRAND TOTAL of `valCol` is emitted as that
    * column on every row. It is computed on the numBlocks-row block
    * summary inside the same single-partition window stage as the
    * offsets, then rides the existing broadcast join back — callers that
    * need cumulative/total ratios (Pareto cutoffs, equi-depth splits)
    * get it for ZERO extra scans, where a separate `df.agg(sum)` would
    * re-execute the whole upstream lineage once more.
    */
  def exclusivePrefixSumBy(df: DataFrame, ordExprs: Seq[Column],
      valCol: String, outCol: String = "start",
      numBlocks: Int = AdaptiveBlocks,
      totCol: Option[String] = None): DataFrame = {
    require(ordExprs.nonEmpty, "ordExprs must be non-empty")
    require(numBlocks >= 0, "numBlocks must be positive (0 = adaptive)")
    val nBlocks = resolveBlocks(df, numBlocks)
    // Range partitions are contiguous, disjoint ordCol intervals in
    // partition-index order, so spark_partition_id IS the block key: the
    // concatenation of blocks 0..n-1 each internally ordered by ordCol
    // is the global order.
    //
    // localCheckpoint is CORRECTNESS here, not an optimization: the
    // block assignment feeds both the block-sum side and the join-back
    // side, and each consumer would otherwise re-plan the range
    // exchange with its own column pruning. Two pruned plans are no
    // longer identical, ReuseExchange doesn't fire, and the two
    // exchanges SAMPLE THEIR RANGE BOUNDARIES INDEPENDENTLY (seeded by
    // rdd.id) — rows then sit in different blocks than the block sums
    // assume and offsets silently misalign (caught by m08, whose
    // modality column breaks the plan-identity that had protected t17).
    // Checkpointing pins one materialized partitioning for every
    // consumer.
    val blk = df.repartitionByRange(nBlocks, ordExprs: _*)
      .withColumn("__blk", spark_partition_id())
      .localCheckpoint(false)
    val bsums = blk.groupBy(col("__blk"))
      .agg(sum(col(valCol)).as("__bsum"))
    // The one ordered-global window: runs over exactly numBlocks rows.
    val offW = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val boffs = bsums
      .withColumn("__boff", coalesce(sum(col("__bsum")).over(offW), lit(0L)))
      .select(Seq(col("__blk").as("__ob"), col("__boff")) ++
        totCol.map(t => sum(col("__bsum")).over(totW).as(t)): _*)
    val inW = Window.partitionBy(col("__blk")).orderBy(ordExprs: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blk.join(broadcast(boffs), col("__blk") === col("__ob"))
      .withColumn(outCol,
        col("__boff") + sum(col(valCol)).over(inW) - col(valCol))
      .drop("__blk", "__ob", "__boff")
  }

  /** 0-based global row number over the `ordCols` order — the ranking
    * twin of [[exclusivePrefixSum]] (prefix-count of ones, multi-column
    * ordering). Replaces the canonical non-scalable plan `row_number()
    * OVER (ORDER BY ...)` — one task ranking the whole frame — with the
    * same two-level scan: range-partition on `ordCols` (blocks are
    * contiguous key intervals in partition order), per-block counts,
    * one window over the `numBlocks` summary rows, broadcast the block
    * offsets back, rank within blocks only.
    *
    * Ranks equal the global window's for any `numBlocks` as long as
    * `ordCols` is a total order (include a unique tie-breaker column);
    * with a non-total order, ties get arbitrary-but-distinct
    * consecutive ranks — exactly the global window's contract.
    *
    * localCheckpoint for the same reason as [[exclusivePrefixSum]]:
    * multiple consumers must see ONE sampled range partitioning, not
    * re-sampled boundaries per consumer.
    */
  def globalRowNumber(df: DataFrame, ordCols: Seq[String],
      outCol: String = "rn", numBlocks: Int = AdaptiveBlocks): DataFrame = {
    require(ordCols.nonEmpty, "ordCols must be non-empty")
    require(numBlocks >= 0, "numBlocks must be positive (0 = adaptive)")
    val ords = ordCols.map(col)
    val blk = df.repartitionByRange(resolveBlocks(df, numBlocks), ords: _*)
      .withColumn("__blk", spark_partition_id())
      .localCheckpoint(false)
    val bcnt = blk.groupBy(col("__blk")).agg(count(lit(1)).as("__bn"))
    // The one ordered-global window: runs over exactly numBlocks rows.
    val offW = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boffs = bcnt
      .withColumn("__boff", coalesce(sum(col("__bn")).over(offW), lit(0L)))
      .select(col("__blk").as("__ob"), col("__boff"))
    val inW = Window.partitionBy(col("__blk")).orderBy(ords: _*)
    blk.join(broadcast(boffs), col("__blk") === col("__ob"))
      .withColumn(outCol,
        col("__boff") + row_number().over(inW).cast("long") - 1L)
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
      seqLen: Int, numBlocks: Int = AdaptiveBlocks): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val n = col(nTokCol)
    exclusivePrefixSum(df, idCol, nTokCol, "start_token", numBlocks)
      .withColumn("first_seq",
        when(n > 0, expr(s"start_token div $seqLen")))
      .withColumn("last_seq",
        when(n > 0, expr(s"(start_token + $nTokCol - 1) div $seqLen")))
      .withColumn("n_seqs",
        coalesce(col("last_seq") - col("first_seq") + 1, lit(0L)))
  }
}
