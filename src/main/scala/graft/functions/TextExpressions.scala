package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: tokenize → w-word shingles → md5 → k linear
  * minima, in one pass of plain JVM code per row.
  *
  * Bit-compatible with the declarative formulation (and the DuckDB oracle):
  *   h1 = first 15 hex digits of md5(shingle)  = (bytes[0..7]  as u64) >>> 4
  *   h2 = hex digits 17..31                    = (bytes[8..15] as u64) >>> 4
  *   sig_i = (h1 + i * (h2 >> 3)) mod (2^61 - 1)
  * Tokenization matches Spark's split(text, '\\s+') (Java regex, limit -1);
  * shingles are distinct (set semantics), matching array_distinct.
  *
  * Why an Expression and not the equivalent transform/aggregate chain:
  * higher-order functions are CodegenFallback and evaluate their lambda per
  * element through the interpreter — measured ~6x slower at sf0.1. This is
  * the SURVEY §4.2 promotion path: same semantics, tight loop.
  */
case class MinhashSignature(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val P = 2305843009213693951L // 2^61 - 1
  @transient private lazy val ws = "\\s+".r.pattern
  @transient private lazy val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def u64be(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xFFL); i += 1 }
    v
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = ws.split(text, -1)
    val shingleSet = new java.util.LinkedHashSet[String]()
    if (toks.length >= w) {
      var i = 0
      while (i + w <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < w) { sb.append(' ').append(toks(i + j)); j += 1 }
        shingleSet.add(sb.toString)
        i += 1
      }
    } else {
      shingleSet.add(String.join(" ", toks: _*))
    }
    val mins = Array.fill(k)(Long.MaxValue)
    val md = digest.get()
    val it = shingleSet.iterator()
    while (it.hasNext) {
      md.reset()
      val d = md.digest(it.next().getBytes("UTF-8"))
      val h1 = u64be(d, 0) >>> 4
      val h2r = (u64be(d, 8) >>> 4) >> 3
      var i = 0
      while (i < k) {
        val h = (h1 + i * h2r) % P
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression)
      : MinhashSignature = copy(child = c)
}

/** Native 60-bit SimHash over whitespace tokens (duplicates weighted):
  * bit j set iff strictly more than half the token hashes have bit j set,
  * token hash = first 15 hex digits of md5 (the CrossHash convention).
  * Bit-identical to the expr-based fold it replaces and the DuckDB oracle.
  */
case class Simhash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash60"

  @transient private lazy val ws = "\\s+".r.pattern
  @transient private lazy val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    val ones = new Array[Int](60)
    val md = digest.get()
    var t = 0
    while (t < toks.length) {
      md.reset()
      val d = md.digest(toks(t).getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
      h = h >>> 4
      var j = 0
      while (j < 60) { ones(j) += ((h >> j) & 1L).toInt; j += 1 }
      t += 1
    }
    var sh = 0L
    var j = 0
    while (j < 60) {
      if (2 * ones(j) > toks.length) sh |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sh)
  }

  override protected def withNewChildInternal(c: Expression): Simhash60 =
    copy(child = c)
}

/** Native distinct w-word shingles (first-occurrence order, matching
  * array_distinct over the declarative transform); documents shorter than
  * w tokens contribute their whole text as one shingle.
  */
case class WordShingles(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w > 0)

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  @transient private lazy val ws = "\\s+".r.pattern

  override def nullSafeEval(input: Any): Any = {
    val toks = ws.split(input.asInstanceOf[UTF8String].toString, -1)
    val set = new java.util.LinkedHashSet[String]()
    if (toks.length >= w) {
      var i = 0
      while (i + w <= toks.length) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < w) { sb.append(' ').append(toks(i + j)); j += 1 }
        set.add(sb.toString)
        i += 1
      }
    } else set.add(String.join(" ", toks: _*))
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object TextFunctions {
  /** MinHash signature column: array<long> of length k. */
  def minhash_signature(text: Column, k: Int = 16, w: Int = 3): Column =
    Bridge.toColumn(MinhashSignature(Bridge.toExpression(text), k, w))

  /** 60-bit SimHash column. */
  def simhash60(text: Column): Column =
    Bridge.toColumn(Simhash60(Bridge.toExpression(text)))

  /** Distinct w-word shingles column. */
  def word_shingles(text: Column, w: Int = 3): Column =
    Bridge.toColumn(WordShingles(Bridge.toExpression(text), w))
}
