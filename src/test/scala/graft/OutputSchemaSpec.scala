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

  /** Every query with an UNPARTITIONED window in its optimized plan —
    * the single-task scale hazard — must be on this list, and each entry
    * must rank/accumulate a BOUNDED frame only:
    *  - block-summary scans (numBlocks rows; Packing two-level pattern):
    *    m08, m20, m21, q88, q101, q105, t17, t36, t54
    *  - grand totals / cumulative over a genuinely BOUNDED frame — one
    *    that does NOT grow with SF (nation/region/partition/format/
    *    report-grain, or t30's documented bucketDocs knob; argued in
    *    each query's comment). Part/customer/price-grain frames do NOT
    *    qualify (SF-linear) — q88 and q101 were rewritten onto the block
    *    scan, t50's unbounded-support histogram total onto a broadcast
    *    aggregate, for exactly that reason:
    *    d35, d38, k14, m16, q106, q89, t30
    *  - ranks over a model-sized table (PQ codebook m×256, broadcast
    *    query/probe panel): s04, s07, s10, s11, s14, s17, s37, d10, d31, d44
    *  - ranks AFTER a top-k/limit or over a HAVING-thinned candidate
    *    table: q102, t18, t20, t51, g06, d43
    * A new query appearing here fails the gate until its frame is argued
    * bounded (add it with a class above) or rewritten on
    * Packing.globalRowNumber / sort+limit.
    */
  private val globalWindowAllowlist: Set[String] = Set(
    "d10_embedding_neardup_lsh", "d31_lsh_recall",
    "d44_lsh_recall_sampled", "d35_threshold_sweep",
    "d38_cross_lang_dup", "d43_pair_explain", "g06_cooccur",
    "k14_partition_skew", "m08_interleaved_pack", "m16_magic_sniff",
    "m20_contrastive_pairs", "m21_batch_shaping", "q101_range_splits",
    "q102_skew_detector", "q105_revenue_gini", "q106_lorenz_curve",
    "q88_abc_pareto", "q89_parent_share", "s04_lsh_search",
    "s07_lsh_multiprobe", "s10_pq_search", "s11_ivf_pq_search",
    "s14_rerank", "s17_subseq_search", "s37_pq_recall",
    "t17_sequence_pack", "t18_repeated_ngrams", "t20_bm25",
    "t30_vocab_growth", "t36_systematic_sample",
    "t51_passage_retrieval", "t54_quality_dup_calibration")

  // One pass over every query: analyzed schema for the type gate,
  // optimized plan for the window sweep.
  private lazy val sweep: (Seq[String], Set[String]) = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val badTypes = Seq.newBuilder[String]
    val gwins = Set.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df =
        try fn(spark, sf)
        catch { case e: Throwable =>
          fail(s"$name failed to build: ${e.getMessage}")
        }
      df.schema.fields.foreach { f =>
        if (!ok(f.dataType)) badTypes += s"$name.${f.name}: ${f.dataType}"
      }
      val hasGlobal = df.queryExecution.optimizedPlan.collectFirst {
        case w: LWindow if w.partitionSpec.isEmpty => ()
      }.isDefined
      if (hasGlobal) gwins += name
    }
    (badTypes.result(), gwins.result())
  }

  test("every query's output schema uses only hash-stable types " +
      "(no DECIMAL, no struct/map)") {
    assert(sweep._1.isEmpty,
      s"hash-fragile output columns:\n${sweep._1.mkString("\n")}")
  }

  test("unpartitioned windows appear only in the bounded-frame allowlist") {
    val extra = sweep._2 -- globalWindowAllowlist
    val stale = globalWindowAllowlist -- sweep._2
    assert(extra.isEmpty, "new single-task window (argue bounded or " +
      s"rewrite on Packing.globalRowNumber): ${extra.mkString(", ")}")
    assert(stale.isEmpty,
      s"allowlist entries no longer needed: ${stale.mkString(", ")}")
  }
}
