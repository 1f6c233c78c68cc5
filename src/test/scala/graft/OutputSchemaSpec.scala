package graft

import org.apache.spark.sql.types._

/** Output-type discipline for the driver's oracle gate.
  *
  * The driver's result hash is sensitive to result-type RENDERINGS, not
  * just values: DuckDB widens integer aggregates to HUGEINT and decimal
  * sums to DECIMAL(38,2) while Spark emits BIGINT / DECIMAL(28,2), and
  * the two sides of the compare surface DECIMAL differently (Decimal
  * objects vs float64). Round 5 lost nine value-identical queries to
  * exactly this. The repo-wide rule since: aggregate in DECIMAL for
  * exactness where order-free bit-equality matters, but CAST the final
  * output column to DOUBLE/BIGINT on both engines — no query result may
  * carry DECIMAL (or any type outside the proven-stable set) to the
  * driver.
  *
  * This spec walks every SparkEntry.queries entry's ANALYZED schema (no
  * execution beyond what DataFrame construction itself requires), so a
  * new query with a decimal or otherwise hash-fragile output fails here
  * before it ever reaches the driver.
  */
class OutputSchemaSpec extends SparkSpec {

  private val allowedAtomic: Set[DataType] = Set(
    StringType, BooleanType, DateType, TimestampNTZType, TimestampType,
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    BinaryType)

  private def ok(dt: DataType): Boolean = dt match {
    case _: DecimalType => false
    case ArrayType(e, _) => ok(e)
    case t => allowedAtomic.contains(t)
  }

  test("every query's output schema uses only hash-stable types " +
      "(no DECIMAL, no struct/map)") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema =
          try fn(spark, sf).schema
          catch { case e: Throwable =>
            fail(s"$name failed to build: ${e.getMessage}")
          }
        schema.fields.collect {
          case f if !ok(f.dataType) => s"$name.${f.name}: ${f.dataType}"
        }
    }
    assert(bad.isEmpty, s"hash-fragile output columns:\n${bad.mkString("\n")}")
  }
}
