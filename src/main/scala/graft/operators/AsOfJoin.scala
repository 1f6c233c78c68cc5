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
    val r = leftCols.foldLeft(
      right.withColumn("__k", col(keyR)).withColumn("__t", col(timeR))
        .withColumn("__side", lit(0)).withColumn("__m", matchStruct))(
      (d, c) => d.withColumn(c, lit(null)))
    val cols = (leftCols ++ Seq("__k", "__t", "__side", "__m")).map(col)

    // Right rows (side 0) sort before left rows at equal time → inclusive.
    // Backward scans time ascending (last right ≤ t); forward scans it
    // descending (so "last" becomes the earliest right ≥ t).
    val ord = if (direction == "backward")
      Seq(col("__t").asc, col("__side").asc)
    else Seq(col("__t").desc, col("__side").asc)
    val w = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.select(cols: _*).unionByName(r.select(cols: _*))
      .withColumn("__m", last(col("__m"), ignoreNulls = true).over(w))
    // Tolerance nulls out the WHOLE match struct — a too-distant match
    // can't leave stale fields behind.
    val bounded = tolerance.fold(carried) { tol =>
      val dist = if (direction == "backward")
        col("__t") - col("__m").getField("__bt")
      else col("__m").getField("__bt") - col("__t")
      carried.withColumn("__m", when(dist <= tol, col("__m")))
    }
    payload.foldLeft(bounded.filter(col("__side") === 1))(
        (d, p) => d.withColumn(p, col("__m").getField(p)))
      .drop("__k", "__t", "__side", "__m")
  }
}
