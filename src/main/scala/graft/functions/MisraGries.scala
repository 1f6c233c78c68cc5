package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch as a typed `Aggregator` — the
  * bounded-memory half of the two-pass heavy-hitters pattern
  * ([[graft.operators.TextAnalysis.heavyHitters]]).
  *
  * The sketch keeps at most `k` (term, counter) entries regardless of
  * stream length. Classic guarantee (Misra & Gries 1982; mergeability per
  * Agarwal et al. 2012, "Mergeable Summaries"): after any sequence of
  * inserts and merges over a stream of n items, every item with true
  * frequency > n/(k+1) is present in the sketch, and each kept counter
  * undercounts its item by at most n/(k+1). That makes the key set a
  * guaranteed SUPERSET of the heavy hitters — a second exact counting
  * pass restricted to the candidates (tiny broadcast) turns it into an
  * exact answer with bounded memory everywhere.
  *
  * Scale: Spark runs partial aggregation map-side, so the shuffle carries
  * one ≤k-entry map per task; the final merge is O(tasks × k). The
  * decrement-all step costs O(k) but fires at most n/(k+1) times per
  * partition (each firing consumes k+1 accumulated counts), so insertion
  * is amortized O(1) per item.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] = {
    if (term == null) return buf // null text → no tokens to count
    buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1L)
      case None if buf.size < k => buf.updated(term, 1L)
      case None => // full: decrement every counter, drop zeros (the new
        // item's single count is consumed by the same decrement)
        buf.iterator.collect { case (t, c) if c > 1L => (t, c - 1L) }.toMap
    }
  }

  /** Merged-MG: sum counters, then if over capacity subtract the
    * (k+1)-largest combined counter from all and keep strictly-positive
    * entries — the reduction that preserves the n/(k+1) error bound
    * (Agarwal et al. 2012, §3.2).
    */
  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val sum = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // (k+1)-th largest counter value (1-indexed); subtracting it keeps
      // at most k strictly-positive entries.
      val thr = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      sum.iterator.collect { case (t, c) if c > thr => (t, c - thr) }.toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Column-level UDAF: `df.agg(MisraGries.misra_gries(k)(col("term")))` →
    * MapType(String, Long) of candidate heavy hitters with approximate
    * (under-)counts.
    */
  def misra_gries(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(k), Encoders.STRING)
}
