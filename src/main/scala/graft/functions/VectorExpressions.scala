package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Native Catalyst expressions for the vector-math hot path (SURVEY.md §4.2:
  * promote from higher-order functions to codegen'd Expressions on measured
  * need — the zip_with+aggregate folds are interpreted per element and
  * dominated the similarity benchmarks).
  *
  * Both expressions are strict left-to-right double folds, bit-identical to
  * the zip_with+aggregate formulation they replace and to DuckDB's
  * list_dot_product / list_reduce on DOUBLE[] — so oracle parity is
  * unchanged. Codegen emits a tight primitive loop inside WholeStageCodegen.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $s;"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared euclidean distance, same fold discipline as [[ArrayDotProduct]]. */
case class ArraySquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_squared_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $d = $a.getDouble($i) - $b.getDouble($i);
          $s += $d * $d;
        }
        ${ev.value} = $s;"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySquaredDistance =
    copy(left = newLeft, right = newRight)
}

/** Argmin kernels shared by the interpreted eval path and generated code
  * (static forwarders, same pattern as [[TextKernels]]). Both reproduce
  * the aggregate-HOF fold they replace EXACTLY: entries scanned in array
  * order, per-entry d2 is the strict left-to-right squared-distance fold
  * rounded like Spark's round(_, 6) (HALF_UP via BigDecimal, NaN/Inf
  * passed through), strict `<` so ties keep the earliest (= lowest-id,
  * the caller sorts) entry, and an empty entry set yields the fold's
  * init (Double.MaxValue, -1).
  */
object VectorKernels {
  private def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def d2(v: ArrayData, e: ArrayData): Double = {
    val n = math.min(v.numElements(), e.numElements())
    var s = 0.0
    var j = 0
    while (j < n) {
      val d = v.getDouble(j) - e.getDouble(j)
      s += d * d
      j += 1
    }
    s
  }

  /** entries: array<struct<id: long, vec: array<double>>> → (d2, id). */
  def nearestEntry(v: ArrayData, entries: ArrayData): InternalRow = {
    var bestD = Double.MaxValue
    var bestId = -1L
    var i = 0
    val n = entries.numElements()
    while (i < n) {
      val e = entries.getStruct(i, 2)
      val r = round6(d2(v, e.getArray(1)))
      if (r < bestD) { bestD = r; bestId = e.getLong(0) }
      i += 1
    }
    InternalRow(bestD, bestId)
  }

  /** entries: array<struct<g: int, id: long, vec: array<double>>> →
    * (d2, id) over the entries whose g matches.
    */
  def nearestEntryInGroup(v: ArrayData, entries: ArrayData,
      g: Int): InternalRow = {
    var bestD = Double.MaxValue
    var bestId = -1L
    var i = 0
    val n = entries.numElements()
    while (i < n) {
      val e = entries.getStruct(i, 3)
      if (e.getInt(0) == g) {
        val r = round6(d2(v, e.getArray(2)))
        if (r < bestD) { bestD = r; bestId = e.getLong(1) }
      }
      i += 1
    }
    InternalRow(bestD, bestId)
  }
}

/** Native argmin over a packed (id, vector) array: the IVF-assignment
  * fold. The aggregate-HOF twin interprets its lambda per centroid per
  * row — N×C interpreted steps with struct allocations; this is a tight
  * loop inside whole-stage codegen. Output: struct<d2: double, id: long>.
  */
case class NearestEntry(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))
  override def prettyName: String = "nearest_entry"

  override def nullSafeEval(v: Any, entries: Any): Any =
    VectorKernels.nearestEntry(v.asInstanceOf[ArrayData],
      entries.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.nearestEntry($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestEntry =
    copy(left = newLeft, right = newRight)
}

/** Group-filtered variant for the PQ encode fold: entries carry a group
  * key (the subspace index) as their first field and only matching
  * entries compete. Output: struct<d2: double, id: long>.
  */
case class NearestEntryInGroup(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))
  override def prettyName: String = "nearest_entry_in_group"

  override def nullSafeEval(v: Any, entries: Any, g: Any): Any =
    VectorKernels.nearestEntryInGroup(v.asInstanceOf[ArrayData],
      entries.asInstanceOf[ArrayData], g.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.VectorKernels.nearestEntryInGroup($a, $b, $c)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): NearestEntryInGroup =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Stripe-pooled byte signature of a binary payload: `patches` equal
  * stripes (ceil boundaries — identical to the HOF formulation it
  * replaces: stripe i covers 1-based bytes
  * floor((i·n + P−1)/P)+1 .. floor(((i+1)·n + P−1)/P)), each stripe the
  * sum of its UNSIGNED byte values. The HOF path hexed the payload and
  * parsed every byte back through substr+conv — two string allocations
  * per byte; this reads the bytes directly (measured ~10x on the m09/m10
  * media signatures). The DuckDB oracle keeps the hex formulation —
  * values are identical by construction.
  */
case class PatchPool(child: Expression, patches: Int)
    extends UnaryExpression {
  require(patches > 0, "patches must be positive")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "patch_pool"

  override def nullSafeEval(input: Any): Any =
    PatchKernels.pool(input.asInstanceOf[Array[Byte]], patches)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PatchKernels.pool($c, $patches)")

  override protected def withNewChildInternal(newChild: Expression)
      : PatchPool = copy(child = newChild)
}

/** Static forwarder shared by [[PatchPool]]'s eval and generated code. */
object PatchKernels {
  def pool(bytes: Array[Byte], patches: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = bytes.length
    val out = new Array[Long](patches)
    var i = 0
    while (i < patches) {
      // same ceil boundaries as the hex HOF: 0-based [lo, hi)
      val lo = ((i.toLong * n + patches - 1) / patches).toInt
      val hi = (((i + 1).toLong * n + patches - 1) / patches).toInt
      var s = 0L
      var j = lo
      while (j < hi) { s += (bytes(j) & 0xFF).toLong; j += 1 }
      out(i) = s
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Column-API wrappers (classic/non-Connect sessions). */
object VectorFunctions {
  def dot_product(a: Column, b: Column): Column =
    Bridge.toColumn(ArrayDotProduct(
      Bridge.toExpression(a), Bridge.toExpression(b)))
  def squared_distance(a: Column, b: Column): Column =
    Bridge.toColumn(ArraySquaredDistance(
      Bridge.toExpression(a), Bridge.toExpression(b)))
  def nearest_entry(v: Column, entries: Column): Column =
    Bridge.toColumn(NearestEntry(
      Bridge.toExpression(v), Bridge.toExpression(entries)))
  def nearest_entry_in_group(v: Column, entries: Column, g: Column): Column =
    Bridge.toColumn(NearestEntryInGroup(Bridge.toExpression(v),
      Bridge.toExpression(entries), Bridge.toExpression(g)))
  def patch_pool(payload: Column, patches: Int): Column =
    Bridge.toColumn(PatchPool(Bridge.toExpression(payload), patches))
}
