package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {

  test("two-level prefix sum == single running-sum window, gaps and all") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // sparse, non-contiguous ids (deletes happen) + zero values
    val rows = (0 until 2000).map(i => (i.toLong * 7 + rnd.nextInt(3),
        rnd.nextInt(40).toLong))
      .distinctBy(_._1)
    val df = rows.toDF("id", "n")
    val got = Packing.exclusivePrefixSum(df, "id", "n", numBlocks = 8)
      .select(col("id"), col("start")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = df.withColumn("start", coalesce(sum(col("n")).over(w),
        lit(0L))).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === naive)
  }

  test("globalRowNumber == global row_number window, multi-column order, " +
      "any numBlocks") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // duplicate primary keys force the tie-breaker column to matter
    val rows = (0 until 1500).map(i =>
      (rnd.nextInt(50).toDouble / 7, i.toLong * 3 + 1))
    val df = rows.toDF("score", "id")
    val naive = df.withColumn("rn",
        row_number().over(Window.orderBy(col("score"), col("id")))
          .cast("long") - 1L)
      .collect().map(r => (r.getDouble(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    for (blocks <- Seq(1, 7, 64)) {
      val got = Packing.globalRowNumber(df, Seq("score", "id"), "rn", blocks)
        .collect().map(r => (r.getDouble(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(got === naive, s"numBlocks=$blocks")
    }
  }

  test("prefix sum stays correct when a rider column prunes the two " +
      "consumers differently (independent range-exchange regression)") {
    import spark.implicits._
    // The m08 failure shape: an extra column the block-sum side prunes
    // away. Without the pinned partitioning, the two range exchanges
    // sample different boundaries and offsets misalign.
    val rnd = new scala.util.Random(7)
    val df = (0 until 3000)
      .map(i => (i.toLong * 3, rnd.nextInt(40).toLong,
        if (i % 2 == 0) "text" else "media"))
      .toDF("id", "n", "rider")
    val got = Packing.exclusivePrefixSum(df, "id", "n", numBlocks = 8)
      .orderBy(col("id"))
      .select(col("id"), col("n"), col("start"), col("rider")).collect()
    // exact exclusive running sum, rider intact — and therefore
    // monotone (the broken path jumps backward at block seams)
    var run = 0L
    got.foreach { r =>
      assert(r.getLong(2) === run, s"id=${r.getLong(0)}")
      run += r.getLong(1)
    }
    assert(got.count(_.getString(3) == "text") === 1500)
  }

  test("packSequences is numBlocks-invariant and handles zero-token docs") {
    import spark.implicits._
    val df = Seq((0L, 100L), (1L, 0L), (2L, 500L), (3L, 512L), (4L, 1L),
      (5L, 2000L), (6L, 0L), (7L, 12L)).toDF("doc_id", "n_tokens")
    def run(nb: Int) =
      Packing.packSequences(df, "doc_id", "n_tokens", seqLen = 512,
          numBlocks = nb)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val small = run(3)
    assert(small === run(1024)) // long addition is associative
    val byId = small.map(s => s.head -> s).toMap
    // doc 0: tokens [0,100) -> seq 0 only
    assert(byId(0L).drop(2) === Seq(0L, 0L, 0L, 1L))
    // doc 1: zero tokens -> no sequence
    assert(byId(1L).drop(2) === Seq(100L, null, null, 0L))
    // doc 2: [100,600) crosses the seq0/seq1 boundary
    assert(byId(2L).drop(2) === Seq(100L, 0L, 1L, 2L))
    // doc 3: [600,1112) -> seqs 1..2
    assert(byId(3L).drop(2) === Seq(600L, 1L, 2L, 2L))
    // doc 4: [1112,1113) single token
    assert(byId(4L).drop(2) === Seq(1112L, 2L, 2L, 1L))
    // doc 5: [1113,3113) spans seqs 2..6
    assert(byId(5L).drop(2) === Seq(1113L, 2L, 6L, 5L))
    // doc 7: [3113,3125)
    assert(byId(7L).drop(2) === Seq(3113L, 6L, 6L, 1L))
  }

  test("the only un-partitioned window runs over the block summary") {
    import org.apache.spark.sql.catalyst.plans.logical
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, 5L)).toDF("id", "n")
    val lp = Packing.exclusivePrefixSum(df, "id", "n", numBlocks = 10)
      .queryExecution.optimizedPlan
    val wins = lp.collect { case w: logical.Window => w }
    assert(wins.length === 2, lp)
    val (global, partitioned) = wins.partition(_.partitionSpec.isEmpty)
    assert(global.length === 1, lp)
    assert(partitioned.length === 1, lp)
    // the global window's input must already be aggregated per block —
    // it scans n/blockSize summary rows, never the corpus
    assert(global.head.child.collectFirst {
      case a: logical.Aggregate => a
    }.isDefined, s"global window runs over raw rows:\n$lp")
  }

  test("exclusivePrefixSumBy: composite desc order with tie-breaker == " +
      "the global window, and totCol == the grand total, any numBlocks") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // duplicate scores force the tie-breaker; desc order is the Pareto
    // shape (q88): rank by value descending, break ties by id
    val rows = (0 until 1200).map(i =>
      (rnd.nextInt(40).toLong, i.toLong * 3 + 1, rnd.nextInt(100).toLong))
    val df = rows.toDF("score", "id", "n")
    val w = Window.orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = df.withColumn("start",
        coalesce(sum(col("n")).over(w), lit(0L)))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    val total = rows.map(_._3).sum
    for (blocks <- Seq(1, 5, 48)) {
      val got = Packing.exclusivePrefixSumBy(df,
          Seq(col("score").desc, col("id")), "n", "start", blocks,
          totCol = Some("tot")).collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("start"), r.getAs[Long]("tot")))).toMap
      assert(got.view.mapValues(_._1).toMap === naive, s"numBlocks=$blocks")
      assert(got.values.forall(_._2 == total),
        s"totCol wrong at numBlocks=$blocks")
    }
  }
}
