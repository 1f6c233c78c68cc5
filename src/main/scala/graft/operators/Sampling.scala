package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Reproducible global shuffle for training-data ordering: every row is
    * assigned a (shard, pos) pair that defines a deterministic
    * pseudo-random total order — the order a training run reads the
    * corpus in, reproducible across reruns, engines, and partitionings
    * (which `orderBy(rand())` is not). shard = content-hash mod
    * `nShards`; pos = rank of the hash within the shard (ties by id).
    * Consumers read shards in index order, rows in pos order.
    *
    * Scale: the only non-map operation is one window per shard — nShards
    * independent sort tasks, so parallelism is chosen by the caller
    * (pick nShards ≈ cluster cores; each shard sorts n/nShards rows).
    * No global sort, no single-task window, no driver involvement.
    *
    * Output: input columns + (shard INT, pos BIGINT).
    */
  def shardedOrder(docs: DataFrame, nShards: Int, idCol: String = "doc_id",
      textCol: String = "text", seed: String = "shuf"): DataFrame = {
    require(nShards > 0)
    val h = md5Long(concat(lit(seed + ":"), col(textCol)))
    docs.withColumn("__h", h)
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          .orderBy(col("__h"), col(idCol))).cast("long") - 1L)
      .drop("__h")
  }

  /** Weighted systematic sampling on the cumulative-weight line: lay the
    * corpus end-to-end in `ordCol` order (widths = `wCol`, e.g. token
    * counts) and select every document whose span (cum, cum+w] covers a
    * multiple of `stride` — exactly one pick per `stride` weight units,
    * so a training run gets an EXACT token budget, selection probability
    * proportional to size, zero RNG (reruns and the oracle reproduce it
    * bit-for-bit). Documents wider than the stride are picked more than
    * once (`n_picks` — epoch upsampling for oversized docs). Output:
    * selected rows only, (input columns, cum_start, n_picks).
    *
    * Scale: the cumulative line is [[Packing.exclusivePrefixSum]] — the
    * two-level range-partitioned scan, never a global window — and the
    * pick test is map-only integer arithmetic on top. `div`, not
    * floating division: cumulative sums at 100 TB exceed the double
    * mantissa long before they exceed a long.
    */
  def systematicSample(docs: DataFrame, ordCol: String, wCol: String,
      stride: Long, numBlocks: Int = Packing.AdaptiveBlocks): DataFrame = {
    require(stride > 0, "stride must be positive")
    val ps = Packing.exclusivePrefixSum(docs, ordCol, wCol, "cum_start",
      numBlocks)
    ps.withColumn("n_picks",
        expr(s"(cum_start + `$wCol`) div ${stride}L" +
          s" - cum_start div ${stride}L"))
      .filter(col("n_picks") > 0)
  }

  /** Per-domain frequency capping (the C4/Gopher-style "no domain may
    * dominate" curation rule): keep at most `maxPerKey` docs per key,
    * preferring the highest `scoreCol` (ties broken by `idCol` so the cut
    * is deterministic). Emits kept rows with their within-domain rank —
    * the inverse view (what was dropped) is the anti-join.
    *
    * Scale design: one shuffle on the domain key; row_number (not rank)
    * keeps the per-group state a single counter, and WindowGroupLimit
    * prunes each group to maxPerKey rows MAP-SIDE before the exchange, so
    * a 100 TB corpus with a million-doc hot domain ships only maxPerKey
    * rows of it per input partition.
    */
  def domainCap(docs: DataFrame, keyCol: String, scoreCol: String,
      idCol: String, maxPerKey: Int): DataFrame = {
    require(maxPerKey > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    docs.withColumn("src_rank", row_number().over(w))
      .filter(col("src_rank") <= maxPerKey)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): estimate hashed-n-gram bag-of-words models
    * of a TARGET corpus (the distribution you want more of) and a RAW
    * corpus (what you have), then weight every document by its
    * log-likelihood ratio — log w(x) = Σ_features [ln p_target(bucket) −
    * ln p_raw(bucket)] with add-one smoothing over `dim` buckets.
    * Features are the [[graft.functions.TextFunctions.feature_buckets]]
    * unigram+bigram hash trick (native codegen'd expression — one md5 per
    * feature), the same featurizer as [[TextAnalysis.qualityScore]].
    *
    * Output per doc: (idCol, n_feats, log_weight, keep) where keep is the
    * sign gate log_weight > 0 (doc looks more target-like than raw-like)
    * — the deterministic selection rule; full importance RESAMPLING needs
    * only a hash-vs-rate test against these weights downstream.
    *
    * Scale: both corpus models collapse to `dim`-row count tables (one
    * aggregation each, map-side combined); the per-bucket log-ratio table
    * is dim rows, broadcast; scoring is then one map pass over the
    * exploded features with a broadcast join and a per-doc partial
    * aggregation — no shuffle ever carries more than (docs × distinct
    * buckets ≤ dim) rows. Log-ratios round to 6 decimals and sum as
    * DECIMAL(18,6) (exact, order-free), so weights are bit-reproducible
    * on any partitioning and cross-engine.
    */
  def dsirWeights(docs: DataFrame, target: DataFrame, raw: DataFrame,
      dim: Int = 256, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(dim > 0)
    val dec6 = DecimalType(18, 6)
    def fx(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ explode(graft.functions.TextFunctions
        .feature_buckets(col(textCol), dim)).as("bucket"): _*)
    val tc = fx(target).groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val rc = fx(raw).groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val nt = tc.agg(sum(col("ct")).as("nt"))
    val nr = rc.agg(sum(col("cr")).as("nr"))
    def ratio(ct: Column, cr: Column): Column =
      round(log((ct + lit(1.0)) / (col("nt") + lit(dim))) -
        log((cr + lit(1.0)) / (col("nr") + lit(dim))), 6).cast(dec6)
    val lr = tc.join(rc, Seq("bucket"), "full")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("bucket"),
        ratio(coalesce(col("ct"), lit(0L)), coalesce(col("cr"), lit(0L)))
          .as("lw"))
    // LEFT join + the smoothed zero-count default: a scored doc OUTSIDE
    // target ∪ raw can carry buckets neither corpus saw, and add-one
    // smoothing gives those ln((nr+dim)/(nt+dim)), not a dropped row.
    fx(docs, col(idCol))
      .join(broadcast(lr), Seq("bucket"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .withColumn("__lw", coalesce(col("lw"), ratio(lit(0L), lit(0L))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__lw")).as("__s"))
      .select(col(idCol), col("n_feats"),
        round(col("__s").cast("double"), 6).as("log_weight"),
        (col("__s").cast("double") > 0.0).as("keep"))
  }

  /** Leakage-free train/val/test split: near-duplicate documents MUST land
    * on the same side, or held-out evaluation silently overlaps training
    * (the classic contamination bug d07's plain content-hash split cannot
    * prevent). Every doc's split is decided by its near-dup CLUSTER's
    * canonical (min-id) document — singletons are their own cluster — so
    * an entire dup cluster moves together by construction. The membership
    * test is the usual content-hash-vs-threshold (engine- and
    * rerun-reproducible); `pairs` is any certified near-dup pair set
    * (minhash, simhash, embedding — caller's choice of evidence).
    * Output: (idCol, cluster_id, split).
    *
    * Scale: clusters via pointer-jumping [[Dedup.connectedComponents]]
    * (O(log diameter) rounds); the canonical-text fetch is a key join on
    * cluster_id; everything else is map-side hashing.
    */
  def leakFreeSplit(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "percentages must partition [0, 100)")
    val clusters = Dedup.connectedComponents(pairs)
      .select(col("id").as(idCol), col("cluster"))
    val withCl = docs.select(col(idCol))
      .join(clusters, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster"), col(idCol)))
      .drop("cluster")
    val canon = docs.select(col(idCol).as("cluster_id"),
      (md5Long(concat(lit("lfs:"), col(textCol))) % 100).as("__h"))
    withCl.join(canon, "cluster_id")
      .withColumn("split",
        when(col("__h") < trainPct, "train")
          .when(col("__h") < trainPct + valPct, "val")
          .otherwise("test"))
      .select(col(idCol), col("cluster_id"), col("split"))
  }
}
