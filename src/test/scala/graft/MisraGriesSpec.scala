package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.operators.TextAnalysis

/** The Misra-Gries guarantees the two-pass heavy-hitters pattern rests on:
  * the sketch key set must remain a superset of every item with frequency
  * > n/(k+1) under ANY partitioning (arbitrary partial-aggregation merge
  * trees), buffers must stay ≤ k entries, and the confirm pass must make
  * the final answer EXACTLY the full-groupBy result.
  */
class MisraGriesSpec extends SparkSpec {

  // skewed fixture: 2 true heavy hitters drowned in one-off noise
  private def skewedDocs = {
    import spark.implicits._
    val rows = Seq.fill(3000)("hh1") ++ Seq.fill(1500)("hh2") ++
      (0 until 20000).map(i => s"noise$i")
    rows.toDF("text").repartition(32) // random partitioning → many merges
  }

  test("sketch keys contain every guaranteed-frequency item under merges") {
    val sk = skewedDocs
      .agg(MisraGries.misra_gries(49)(col("text")).as("m"))
      .collect()(0).getAs[Map[String, Long]]("m")
    // n = 24500, k = 49 → every item with freq > 500 must survive
    assert(sk.contains("hh1") && sk.contains("hh2"), sk.keys.take(10))
    assert(sk.size <= 49, s"buffer overflowed capacity: ${sk.size}")
  }

  test("heavyHitters == exact groupBy on the skewed fixture") {
    val got = TextAnalysis.heavyHitters(skewedDocs, capacity = 49,
        minFrac = 0.05)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // exact answer: ceil(0.05 * 24500) = 1225 → hh1 (3000) and hh2 (1500)
    assert(got === Set(("hh1", 3000L), ("hh2", 1500L)))
  }

  test("guarantee gate fails loudly when minFrac is below 1/(capacity+1)") {
    val e = intercept[Exception] {
      TextAnalysis.heavyHitters(skewedDocs, capacity = 9, minFrac = 0.05)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("heavyHitters")), e.toString)
  }

  test("reduce evicts by decrement-all; merge subtracts the (k+1)-largest") {
    val mg = new MisraGries(2)
    // eviction: full buffer, unseen item → all counters decrement, zeros drop
    assert(mg.reduce(Map("a" -> 1L, "b" -> 2L), "c") === Map("b" -> 1L))
    // merge over capacity: {a:5,b:3} + {c:4,b:1} → sums {a:5,b:4,c:4},
    // 3rd-largest counter = 4 → keep strictly greater − 4
    assert(mg.merge(Map("a" -> 5L, "b" -> 3L), Map("c" -> 4L, "b" -> 1L))
      === Map("a" -> 1L))
  }
}
