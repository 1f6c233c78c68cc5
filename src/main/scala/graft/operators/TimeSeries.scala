package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series subsequence similarity search: find the sliding windows of
  * a per-key value series closest (z-normalized euclidean) to a query
  * pattern — the UCR-suite-style primitive behind motif/pattern mining on
  * event streams (cf. "Time Series Similarity Search for Streaming Data
  * in Distributed Systems", EDBT 2019 — the distributed formulation this
  * mirrors: series are partitioned by key, windows never leave their
  * key's partition).
  *
  * Scale shape: one shuffle groups each key's readings (state bounded by
  * a single key's history length, the same per-doc discipline as every
  * text operator here); window expansion and the z-norm distance folds
  * are per-row HOF arithmetic inside the key's partition; the global
  * top-k is TakeOrderedAndProject (no global sort, no corpus-wide
  * window). Distance math is index-order left folds — bit-reproducible
  * cross-engine.
  */
object TimeSeries {

  /** Top-`k` windows of length `w` across all keys, ranked by
    * z-normalized euclidean distance to the z-normalized RAMP pattern
    * (0, 1, …, w−1) — i.e. the strongest linear-trend matches. The ramp's
    * z-norm is closed-form: mean (w−1)/2, variance (w²−1)/12, both exact
    * in double for any sane w, so both engines build the identical query
    * vector. Flat windows (sd = 0 after round-12) are skipped — z-norm is
    * undefined there. Output: (key, start_idx, d2, rank), rank assigned
    * after the top-k cut.
    */
  def rampSearch(events: DataFrame, keyCol: String = "user_id",
      timeCol: String = "ts", tieCol: String = "event_id",
      valCol: String = "value", w: Int = 8, k: Int = 10): DataFrame = {
    require(w >= 2, "window length must be at least 2")
    require(k > 0, "k must be positive")
    val qMean = (w - 1) / 2.0
    val qSd = math.sqrt((w.toDouble * w - 1.0) / 12.0)
    val qz: Column = transform(sequence(lit(0), lit(w - 1)),
      i => (i.cast("double") - qMean) / qSd)
    val ser = events.groupBy(col(keyCol).as("key"))
      .agg(transform(array_sort(collect_list(
          struct(col(timeCol), col(tieCol), col(valCol).as("v")))),
        e => e.getField("v")).as("vs"))
    val win = ser.filter(size(col("vs")) >= w)
      .select(col("key"), col("vs"),
        posexplode(sequence(lit(0), size(col("vs")) - w))
          .as(Seq("start_idx", "__i")))
      .select(col("key"), col("start_idx"),
        slice(col("vs"), col("start_idx") + 1, lit(w)).as("win"))
    val stats = win
      .withColumn("m",
        aggregate(col("win"), lit(0.0), (a, x) => a + x) / w.toDouble)
      .withColumn("sd", sqrt(
        aggregate(col("win"), lit(0.0),
          (a, x) => a + (x - col("m")) * (x - col("m"))) / w.toDouble))
      .filter(round(col("sd"), 12) > 0.0)
    val scored = stats.select(col("key"), col("start_idx"),
      round(aggregate(zip_with(col("win"), qz,
          (x, q) => ((x - col("m")) / col("sd") - q) *
            ((x - col("m")) / col("sd") - q)),
        lit(0.0), (a, x) => a + x), 6).as("d2"))
    val top = scored.orderBy(col("d2"), col("key"), col("start_idx")).limit(k)
    // rank AFTER the cut — the un-partitioned window sees only k rows
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("d2"), col("key"), col("start_idx"))))
  }

  /** Fixed-bin histogram quantiles — the percentile that scales. An
    * exact per-group percentile (q23) sorts every group's values; the
    * histogram reduces the corpus to (groups × bins) rows in ONE
    * map-side-combined aggregation and reads quantiles off the
    * cumulative bin counts, so 100 TB of raw values never shuffle —
    * only the tiny histogram does. Error is bounded by `binWidth`: the
    * reported quantile is the LOWER EDGE of the smallest bin whose
    * cumulative count reaches p% of the group. Thresholds compare in
    * exact integer cross-multiplication (100·cum ≥ pct·n), never a
    * floating p·n.
    * Output: (keyCol, n, p<pct> per requested pct) — edges as doubles.
    */
  def histogramQuantiles(df: DataFrame, keyCol: String, valCol: String,
      binWidth: Double = 10.0,
      pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100),
      "pcts must be in 1..100")
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(keyCol),
        floor(col(valCol) / binWidth).cast("long").as("__bin"))
      .agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = hist.withColumn("__cum", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val binAggs = pcts.map(p =>
      min(when(col("__cum") * 100 >= col("__n") * p, col("__bin")))
        .as(s"__b$p"))
    cum.groupBy(col(keyCol))
      .agg(max(col("__n")).as("n"), binAggs: _*)
      .select(col(keyCol) +: col("n") +:
        pcts.map(p => (col(s"__b$p") * binWidth).as(s"p$p")): _*)
  }

  /** Slowly-changing-dimension (type 2) build from a CDC change stream:
    * per key, ordered attribute observations collapse into validity
    * intervals [valid_from_us, valid_to_us) with a version number and an
    * is_current flag on the open interval. Consecutive observations with
    * an unchanged attribute tuple are no-ops and never open a new
    * version (the lag-compare runs BEFORE versioning, so a flapping
    * upstream that re-emits unchanged rows cannot inflate the dimension).
    *
    * Scale (100 TB of change records): everything is windows over ONE
    * hash partitioning on the key — no self-join, no collect. State per
    * key is O(1) (lag/lead/running count), so a key with millions of
    * changes streams through its sort rather than buffering. Timestamps
    * travel as epoch micros (BIGINT) — cross-engine exact.
    *
    * Ordering must be a total order per key (pass a unique tiebreaker in
    * `ordCols`), or version numbering is nondeterministic under ties.
    */
  def scdIntervals(changes: DataFrame, keyCol: String, timeCol: String,
      ordCols: Seq[Column], attrCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val w = Window.partitionBy(col(keyCol)).orderBy(ordCols: _*)
    val attrs = struct(attrCols.map(col): _*)
    val us = unix_micros(col(timeCol).cast("timestamp"))
    // <=> : the very first row per key (lag = NULL) must open version 1
    // even when an attribute is NULL, and NULL-valued attributes compare
    // stably between consecutive rows.
    val changed = changes
      .withColumn("__keep", !(attrs <=> lag(attrs, 1).over(w)))
      .filter(col("__keep"))
    changed
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from_us", us)
      .withColumn("valid_to_us", lead(us, 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col(keyCol) +: col("version") +: attrCols.map(col) :+
        col("valid_from_us") :+ col("valid_to_us") :+ col("is_current"): _*)
  }

  /** Peak interval concurrency per key (max simultaneously-open
    * intervals), sweep-line form: each interval contributes a +1 point at
    * its start and a −1 at its end, a running sum over (time, delta) per
    * key walks the timeline, and the peak is the running maximum. At
    * equal timestamps the −1 sorts first (delta asc), so closed-open
    * intervals that merely touch do NOT overlap — the standard sweep
    * convention, mirrored in the oracle.
    *
    * This is THE scale formulation: the naive interval self-join is
    * O(n²) per key and quadratic-explodes on any busy key, while the
    * sweep is one shuffle (2n points) + one per-key sort — the same cost
    * envelope as sessionization. Per-key ordering state is O(1).
    * One pathologically hot key serializes its timeline into one task
    * (the per-key-window exposure every sweep shares — see
    * [[AsOfJoin.leftAsOf]]'s bucketWidth escape hatch for the fix shape).
    *
    * Output: (key, n_intervals, peak_concurrency, first_peak_at) with
    * first_peak_at the earliest sweep time the peak is reached —
    * deterministic because (time, delta) is totally ordered within a key
    * except for same-type same-time points, which are interchangeable for
    * both the running sum and its argmax.
    */
  def maxConcurrency(intervals: DataFrame, keyCol: String,
      startCol: Column, endCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = intervals
      .select(col(keyCol).as("__k"), startCol.as("__s"), endCol.as("__e"))
      .select(col("__k"), explode(array(
        struct(col("__s").as("__t"), lit(1).as("__d")),
        struct(col("__e").as("__t"), lit(-1).as("__d")))).as("__p"))
      .select(col("__k"), col("__p")("__t").as("__t"),
        col("__p")("__d").as("__d"))
    val scan = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peakW = Window.partitionBy(col("__k"))
    pts
      .withColumn("__run", sum(col("__d")).over(scan))
      .withColumn("__peak", max(col("__run")).over(peakW))
      .groupBy(col("__k").as(keyCol))
      .agg((count(lit(1)) / 2).cast("long").as("n_intervals"),
        max(col("__peak")).cast("long").as("peak_concurrency"),
        min(when(col("__run") === col("__peak"), col("__t")))
          .as("first_peak_at"))
  }
}
