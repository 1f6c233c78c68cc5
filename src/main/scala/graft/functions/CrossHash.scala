package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine deterministic primitives.
  *
  * The correctness gate compares Spark output against a DuckDB oracle running
  * equivalent SQL on the same parquet (SURVEY.md §5.2). Engine-native hashes
  * (Spark xxhash64 vs DuckDB hash) and float summation order both break
  * bit-equality, so every sketch/aggregate that must hash-match is built on:
  *
  *  - md5 → 60-bit integer: identical in both engines
  *      Spark:  conv(substr(md5(x),1,15),16,10)::long
  *      DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT
  *  - money/metric sums: cast to DECIMAL(18,2) first (exact, order-independent
  *    addition), cast the final sum to DOUBLE — one rounding, same bits.
  */
object CrossHash {

  /** 60-bit non-negative hash of a string column; bit-identical to the DuckDB
    * expression `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** i-th independent hash function (seeded by prefixing the seed). DuckDB:
    * `('0x' || substr(md5(i || ':' || x), 1, 15))::BIGINT`.
    */
  def md5LongSeeded(seed: Int, c: Column): Column =
    md5Long(concat(lit(seed.toString), lit(":"), c))

  /** Exact order-independent sum of a money-like double column, reproducible
    * in DuckDB as `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of price*(1-discount); DuckDB:
    * `CAST(sum(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))) AS DOUBLE)`.
    */
  def drevenue(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) *
      (lit(java.math.BigDecimal.ONE).cast(DecimalType(18, 2)) -
        discount.cast(DecimalType(18, 2)))).cast("double")

  /** Exact mean as (decimal sum)/count computed in double — both engines
    * perform the identical single division. DuckDB:
    * `CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(x)`.
    */
  def davg(c: Column): Column = dsum(c) / count(c)
}
