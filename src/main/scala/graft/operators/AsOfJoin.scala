package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively
  * (SURVEY.md §2.2 joins row): for every left row, the single right row
  * with the greatest right-time <= left-time within the same key.
  *
  * Implementation: union both sides tagged, one shuffle on the key, then a
  * running last-non-null window ordered by (time, side) — right rows sort
  * before left rows at equal timestamps so the match is inclusive. This is
  * the scalable formulation: no range-explosion, no per-key collect;
  * cost is a single sort-shuffle of |L|+|R|, the same as a sort-merge join.
  * (Preference order per SURVEY §4.2: composed built-ins before custom
  * Catalyst nodes — the union+window form IS expressible, so no custom
  * SparkPlan is needed.)
  *
  * Skew: the window partitions by key only, so ONE pathologically hot key
  * (a default user id, a null-ish sentinel) serializes its whole timeline
  * into one task — the same exposure as any per-key window, and AQE cannot
  * split a window partition. The escape hatch is `bucketWidth`: a coarse
  * time-bucket pre-pass that windows within (key, bucket) and carries
  * matches across bucket boundaries through a per-(key, bucket) summary —
  * identical output, parallelism keys × buckets instead of keys.
  *
  * The right side must be unique per (key, time) — dedupe first, otherwise
  * which of the tied rows wins is nondeterministic in any engine.
  *
  * NULL-time rows have no position on the as-of axis, on either side:
  * NULL-time RIGHT rows are dropped up front in BOTH paths (before this
  * filter the plain path could carry one — NULLs sort first under the
  * ascending scan — while the bucketed path's max_by/min_by summaries
  * skipped it), and NULL-time LEFT rows get a NULL match explicitly
  * (backward's ascending scan already placed them before any right row,
  * but forward's descending scan placed them LAST and handed them the
  * minimum-time right row — a direction asymmetry).
  */
object AsOfJoin {

  /** Left as-of join.
    *
    * @param left      probe side
    * @param right     build side, unique per (key, time)
    * @param keyL/keyR equi-key column names
    * @param timeL/timeR event-time column names (same comparable type)
    * @param payload   right-side columns to carry to the output
    * @param direction "backward" (latest right at or before the left time,
    *                  the default) or "forward" (earliest right at or after)
    * @param tolerance max |leftTime - matchedTime| as a numeric bound —
    *                  matches further away are nulled out. Requires a
    *                  numeric time column (convert timestamps with
    *                  unix_micros first).
    * @param bucketWidth when set, the hot-key-safe two-pass variant: rows
    *                  window within (key, time div bucketWidth) and bucket
    *                  summaries carry matches across boundaries. Requires a
    *                  numeric time column; choose a width that yields
    *                  100–10000 buckets over the hot key's time span.
    */
  def leftAsOf(left: DataFrame, right: DataFrame,
      keyL: String, timeL: String, keyR: String, timeR: String,
      payload: Seq[String], direction: String = "backward",
      tolerance: Option[Long] = None,
      bucketWidth: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with " +
        "left-side columns; rename before joining")
    require(direction == "backward" || direction == "forward", direction)
    bucketWidth.foreach(wd => require(wd > 0, "bucketWidth must be positive"))
    val backward = direction == "backward"
    // The whole match — every payload column plus the matched right time —
    // travels as ONE struct through ONE last(ignoreNulls) window, so all
    // output fields come atomically from the same right row. (Carrying the
    // columns independently would back-fill a legitimately-NULL payload
    // value from an OLDER right row and mix fields across matches.)
    val matchStruct = struct(
      payload.map(col) :+ col(timeR).as("__bt"): _*)
    val mType = right.select(matchStruct.as("__m")).schema("__m").dataType
    val l = left.withColumn("__k", col(keyL)).withColumn("__t", col(timeL))
      .withColumn("__side", lit(1))
      .withColumn("__m", lit(null).cast(mType))
    // NULL-time right rows can never be an as-of match (see scaladoc).
    val rightTimed = right.filter(col(timeR).isNotNull)
    val r = leftCols.foldLeft(
      rightTimed.withColumn("__k", col(keyR)).withColumn("__t", col(timeR))
        .withColumn("__side", lit(0)).withColumn("__m", matchStruct))(
      (d, c) => d.withColumn(c, lit(null)))
    val cols = (leftCols ++ Seq("__k", "__t", "__side", "__m")).map(col)

    // Right rows (side 0) sort before left rows at equal time → inclusive.
    // Backward scans time ascending (last right ≤ t); forward scans it
    // descending (so "last" becomes the earliest right ≥ t).
    val ord = if (backward) Seq(col("__t").asc, col("__side").asc)
    else Seq(col("__t").desc, col("__side").asc)
    val u = l.select(cols: _*).unionByName(r.select(cols: _*))

    val carried = bucketWidth match {
      case None =>
        val w = Window.partitionBy(col("__k")).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        u.withColumn("__m", last(col("__m"), ignoreNulls = true).over(w))
      case Some(wd) =>
        // Two-pass segmented scan. Pass 1 windows within (key, bucket) —
        // a hot key parallelizes across its buckets. Pass 2 builds one
        // summary row per (key, bucket) (the bucket's own best match) and
        // carries the nearest non-empty summary across STRICTLY-earlier
        // buckets in scan order; that window runs over buckets, not rows,
        // so its partition is span/bucketWidth — small by construction.
        // NULL keys/times: window partitioning groups NULLs together (so
        // the plain path emits those rows), but join equality would drop
        // them — every join below is therefore null-safe (<=>), keeping
        // the bucketed output row-for-row identical to the plain one.
        val ub = u.withColumn("__b", expr(s"__t div $wd"))
        // default null ordering (asc: first / desc: last) — the same
        // positions NULL __t rows take in the plain path's __t scan
        val bOrd = if (backward) col("__b").asc else col("__b").desc
        // per-bucket best match among right rows: latest (backward) /
        // earliest (forward) — right times are unique per key, so *_by
        // is deterministic
        val bsum = ub.filter(col("__side") === 0)
          .groupBy(col("__k"), col("__b"))
          .agg((if (backward) max_by(col("__m"), col("__t"))
                else min_by(col("__m"), col("__t"))).as("__bs"))
          .withColumnRenamed("__k", "__bk").withColumnRenamed("__b", "__bb")
        // every (key, bucket) the union touches, incl. right-empty ones —
        // a left row in an empty bucket still needs the carry
        val allKb = ub.select(col("__k"), col("__b")).distinct()
        val carryW = Window.partitionBy(col("__k")).orderBy(bOrd)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = allKb.join(bsum,
            col("__k") <=> col("__bk") && col("__b") <=> col("__bb"), "left")
          .withColumn("__carry",
            last(col("__bs"), ignoreNulls = true).over(carryW))
          .select(col("__k").as("__ck"), col("__b").as("__cb"),
            col("__carry"))
        val localW = Window.partitionBy(col("__k"), col("__b"))
          .orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ub.join(carry,
            col("__k") <=> col("__ck") && col("__b") <=> col("__cb"))
          .withColumn("__m", coalesce(
            last(col("__m"), ignoreNulls = true).over(localW),
            col("__carry")))
          .drop("__b", "__carry", "__ck", "__cb")
    }
    // A NULL-time left row matches nothing, in either direction (see
    // scaladoc — forward's desc scan would otherwise hand it the
    // minimum-time right row).
    val timed = carried.withColumn("__m",
      when(col("__t").isNotNull, col("__m")))
    // Tolerance nulls out the WHOLE match struct — a too-distant match
    // can't leave stale fields behind.
    val bounded = tolerance.fold(timed) { tol =>
      val dist = if (backward)
        col("__t") - col("__m").getField("__bt")
      else col("__m").getField("__bt") - col("__t")
      timed.withColumn("__m", when(dist <= tol, col("__m")))
    }
    payload.foldLeft(bounded.filter(col("__side") === 1))(
        (d, p) => d.withColumn(p, col("__m").getField(p)))
      .drop("__k", "__t", "__side", "__m")
  }

  /** Nearest-direction as-of join (pandas merge_asof
    * direction='nearest'): for every left row, the right row with the
    * SMALLEST |leftTime − rightTime| within the key, ties preferring the
    * earlier (backward) match. ONE pass: both sides union once, sort
    * once per key, and the backward candidate (running last over the
    * preceding frame) and forward candidate (running first over the
    * following frame) come off two frames of the SAME window sort — not
    * two joins.
    *
    * Right rows sort before left rows at equal time, so the backward
    * candidate is inclusive (distance 0) and wins the tie by rule —
    * which is why the forward frame starting AT the left row (thereby
    * missing equal-time right rows) loses nothing.
    *
    * Same conventions as [[leftAsOf]]: right unique per (key, time),
    * NULL-time right rows dropped, NULL-time left rows match nothing,
    * `tolerance` (numeric time) nulls out matches beyond the bound.
    * Output adds `payload` columns plus `matched_delta` (|Δt|, NULL when
    * unmatched). Hot-key exposure identical to the plain [[leftAsOf]]
    * path (one key = one task); [[leftAsOfNearestBucketed]] is the
    * hot-key escape hatch (two bucketed one-direction passes joined on a
    * left row id — spec-equated to this path).
    */
  def leftAsOfNearest(left: DataFrame, right: DataFrame,
      keyL: String, timeL: String, keyR: String, timeR: String,
      payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with " +
        "left-side columns; rename before joining")
    require(!leftCols.contains("matched_delta"),
      "left side already has a matched_delta column; rename it")
    val matchStruct = struct(
      payload.map(col) :+ col(timeR).as("__bt"): _*)
    val mType = right.select(matchStruct.as("__m")).schema("__m").dataType
    val l = left.withColumn("__k", col(keyL)).withColumn("__t", col(timeL))
      .withColumn("__side", lit(1))
      .withColumn("__m", lit(null).cast(mType))
    val r = leftCols.foldLeft(
      right.filter(col(timeR).isNotNull)
        .withColumn("__k", col(keyR)).withColumn("__t", col(timeR))
        .withColumn("__side", lit(0)).withColumn("__m", matchStruct))(
      (d, c) => d.withColumn(c, lit(null)))
    val cols = (leftCols ++ Seq("__k", "__t", "__side", "__m")).map(col)
    val u = l.select(cols: _*).unionByName(r.select(cols: _*))

    val base = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
    val prevF = base.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val nextF = base.rowsBetween(Window.currentRow,
      Window.unboundedFollowing)
    val withCand = u
      .withColumn("__p", last(col("__m"), ignoreNulls = true).over(prevF))
      .withColumn("__n", first(col("__m"), ignoreNulls = true).over(nextF))
      .filter(col("__side") === 1)
    val dp = col("__t") - col("__p").getField("__bt")
    val dn = col("__n").getField("__bt") - col("__t")
    val inTolP = tolerance.fold(lit(true))(tol => dp <= tol)
    val inTolN = tolerance.fold(lit(true))(tol => dn <= tol)
    val pOk = col("__p").isNotNull && inTolP
    val nOk = col("__n").isNotNull && inTolN
    val picked = withCand
      .withColumn("__m",
        when(col("__t").isNull, lit(null).cast(mType))
          .when(pOk && (!nOk || dp <= dn), col("__p"))
          .when(nOk, col("__n")))
      .withColumn("matched_delta",
        when(col("__m").isNotNull,
          abs(col("__t") - col("__m").getField("__bt"))))
    payload.foldLeft(picked)(
        (d, p) => d.withColumn(p, col("__m").getField(p)))
      .drop("__k", "__t", "__side", "__m", "__p", "__n")
  }

  /** Hot-key-safe nearest as-of: TWO bucketed one-direction
    * [[leftAsOf]] passes (each parallelizing a hot key across its time
    * buckets) joined on a unique left row id, then the q69 pick rule
    * (nearer wins, ties to backward) applied per row. Output and
    * semantics identical to [[leftAsOfNearest]] — AsOfJoinSpec equates
    * them on a 90%-hot-key fixture — at the cost of one extra sort pass
    * and an id-keyed join; use it when one key dominates the timeline.
    *
    * `leftId` must be unique per left row; `timeR`'s name must not
    * collide with a left column (it rides along as the matched time).
    */
  def leftAsOfNearestBucketed(left: DataFrame, right: DataFrame,
      keyL: String, timeL: String, keyR: String, timeR: String,
      payload: Seq[String], leftId: String,
      tolerance: Option[Long] = None,
      bucketWidth: Option[Long] = None): DataFrame = {
    require(!left.columns.contains(timeR),
      s"right time column $timeR collides with a left column; rename it")
    val pb = payload :+ timeR
    def pass(direction: String) =
      leftAsOf(left, right.filter(col(timeR).isNotNull), keyL, timeL,
        keyR, timeR, pb, direction, tolerance = None,
        bucketWidth = bucketWidth)
    val back = pb.foldLeft(pass("backward"))(
      (d, p) => d.withColumnRenamed(p, s"__b_$p"))
    val fwd = pass("forward")
      .select(col(leftId).as("__fid") +:
        pb.map(p => col(p).as(s"__f_$p")): _*)
    val joined = back.join(fwd, col(leftId) === col("__fid"))
    val dp = col(timeL) - col(s"__b_$timeR")
    val dn = col(s"__f_$timeR") - col(timeL)
    val inTolP = tolerance.fold(lit(true))(tol => dp <= tol)
    val inTolN = tolerance.fold(lit(true))(tol => dn <= tol)
    val pOk = col(s"__b_$timeR").isNotNull && inTolP
    val nOk = col(s"__f_$timeR").isNotNull && inTolN
    val useBack = pOk && (!nOk || dp <= dn)
    val withPick = payload.foldLeft(
        joined.withColumn("matched_delta",
          when(useBack, dp).when(nOk, dn)))(
      (d, p) => d.withColumn(p,
        when(useBack, col(s"__b_$p")).when(nOk, col(s"__f_$p"))))
    withPick.select((left.columns.toSeq.map(col) :+
      col("matched_delta")) ++ payload.map(col): _*)
  }
}
