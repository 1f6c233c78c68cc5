package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF (the `Aggregator[IN, BUF, OUT]` surface from SURVEY.md §2.2):
  * element-wise minimum of MinHash signatures.
  *
  * MinHash sketches compose: min-merging the signatures of a group of
  * documents yields exactly the signature of the union of their shingle
  * sets, so a groupBy + this aggregator sketches arbitrary corpora slices
  * (per source, per day, per cluster) in one pass — the building block for
  * cross-partition dedup at 100 TB. Partial aggregation applies: Spark
  * min-merges map-side, so the shuffle carries one 16-long array per
  * (group x task).
  */
class MinhashUnion(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig == null) return buf // null text → null signature: skip, don't NPE
    var i = 0
    while (i < k && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinhashUnion {
  /** Column-level UDAF: `df.groupBy(g).agg(MinhashUnion.minhash_union(col("sig")))`. */
  def minhash_union(k: Int = 16): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MinhashUnion(k), ExpressionEncoder[Seq[Long]]())
}
