package graft.operators

import org.apache.spark.sql.DataFrame
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
  * The right side must be unique per (key, time) — dedupe first, otherwise
  * which of the tied rows wins is nondeterministic in any engine.
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
    */
  def leftAsOf(left: DataFrame, right: DataFrame,
      keyL: String, timeL: String, keyR: String, timeR: String,
      payload: Seq[String], direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with " +
        "left-side columns; rename before joining")
    require(direction == "backward" || direction == "forward", direction)
    val l = payload.foldLeft(
      left.withColumn("__k", col(keyL)).withColumn("__t", col(timeL))
        .withColumn("__bt", lit(null)).withColumn("__side", lit(1)))(
      (d, p) => d.withColumn(p, lit(null)))
    val r = leftCols.foldLeft(
      right.withColumn("__k", col(keyR)).withColumn("__t", col(timeR))
        .withColumn("__bt", col(timeR)).withColumn("__side", lit(0)))(
      (d, c) => if (payload.contains(c)) d else d.withColumn(c, lit(null)))
    val cols = (leftCols ++ Seq("__k", "__t", "__bt", "__side") ++
      payload.filterNot(leftCols.contains)).map(col)

    // Right rows (side 0) sort before left rows at equal time → inclusive.
    // Backward scans time ascending (last right ≤ t); forward scans it
    // descending (so "last" becomes the earliest right ≥ t).
    val ord = if (direction == "backward")
      Seq(col("__t").asc, col("__side").asc)
    else Seq(col("__t").desc, col("__side").asc)
    val w = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (payload :+ "__bt").foldLeft(l.select(cols: _*)
        .unionByName(r.select(cols: _*))) { (d, p) =>
      d.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    val bounded = tolerance.fold(carried) { tol =>
      val dist = if (direction == "backward") col("__t") - col("__bt")
        else col("__bt") - col("__t")
      payload.foldLeft(carried)((d, p) =>
        d.withColumn(p, when(dist <= tol, col(p))))
    }
    bounded.filter(col("__side") === 1)
      .drop("__k", "__t", "__bt", "__side")
  }
}
