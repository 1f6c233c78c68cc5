package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    (0 until 100).map { i =>
      val d = if (i < 90) "big" else "small"
      (i.toLong, d, s"doc $i body ${i * 7}")
    }.toDF("doc_id", "domain", "text")
  }

  test("temperature mixture upweights small domains (alpha = 0.5)") {
    val out = Sampling.temperatureMixture(fixture, "domain", 50L).cache()
    val rates = out.select(col("domain"), col("sample_rate")).distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // closed form: p_d = sqrt(n_d)/(sqrt(90)+sqrt(10)), rate = 50*p_d/n_d
    // (HALF_UP: the rounding Spark's cast-to-decimal applies)
    val tot = BigDecimal(math.sqrt(90)).setScale(6, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(math.sqrt(10)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def expect(n: Int) =
      math.min(1.0, 50.0 * (BigDecimal(math.sqrt(n)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble / tot.toDouble) / n)
    assert(rates("big") === expect(90))
    assert(rates("small") === expect(10))
    assert(rates("small") > rates("big")) // sqrt upweights the small domain
    // every input row comes back, keep is deterministic across reruns
    assert(out.count() === 100L)
    val again = Sampling.temperatureMixture(fixture, "domain", 50L)
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    out.select("doc_id", "keep").collect()
      .foreach(r => assert(again(r.getLong(0)) === r.getBoolean(1)))
    out.unpersist()
  }

  test("null domains and null texts survive as their own group / keep=false") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("a"), Some("one")), (2L, Some("a"), Some("two")),
      (3L, None, Some("three")), (4L, None, None)
    ).toDF("doc_id", "domain", "text")
    val out = Sampling.temperatureMixture(docs, "domain", 2L).cache()
    // every input row comes back — the NULL domain is a real group
    assert(out.count() === 4L)
    val nullRates = out.filter(col("domain").isNull)
      .select("sample_rate").distinct().collect()
    assert(nullRates.length === 1) // one rate, computed from n=2
    // null text can't hash: keep is false, never NULL
    val r4 = out.filter(col("doc_id") === 4L).select("keep").head()
    assert(!r4.isNullAt(0) && !r4.getBoolean(0))
    out.unpersist()
  }

  test("rates cap at 1 when the budget exceeds the corpus") {
    val out = Sampling.temperatureMixture(fixture, "domain", 10000L)
    assert(out.select(max(col("sample_rate"))).head().getDouble(0) === 1.0)
    assert(out.filter(!col("keep")).count() === 0L)
  }

  test("dsir weights separate target-like from raw-like documents") {
    import spark.implicits._
    val target = Seq((0L, "alpha alpha")).toDF("doc_id", "text")
    val raw = Seq((10L, "beta beta")).toDF("doc_id", "text")
    val docs = Seq((1L, "alpha alpha"), (2L, "beta beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val out = Sampling.dsirWeights(docs, target, raw).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // 2 words -> 2 unigrams + 1 bigram
    assert(out(1L)._1 === 3L && out(2L)._1 === 3L && out(3L)._1 === 1L)
    assert(out(1L)._2 > 0 && out(1L)._3, "target-vocab doc must score > 0")
    assert(out(2L)._2 < 0 && !out(2L)._3, "raw-vocab doc must score < 0")
    // bucket unseen by BOTH corpora: smoothed default ln((nr+d)/(nt+d)),
    // here nt = nr so exactly 0 — the doc survives, undecided, not dropped
    assert(out(3L)._2 === 0.0 && !out(3L)._3)
    // weights are symmetric here: swapping corpora flips the sign
    val sw = Sampling.dsirWeights(docs, raw, target).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sw(1L) === -out(1L)._2 && sw(2L) === -out(2L)._2)
  }

  test("alpha = 1 degenerates to proportional sampling (uniform rate)") {
    val rates = Sampling.temperatureMixture(fixture, "domain", 50L, alpha = 1.0)
      .select(col("sample_rate")).distinct().collect().map(_.getDouble(0))
    assert(rates.length === 1) // p_d ∝ n_d cancels n_d: one global rate
    assert(math.abs(rates(0) - 0.5) < 1e-6)
  }

  test("shardedOrder is partitioning-invariant and dense per shard") {
    val docs = Tables.load(spark, sf, "documents")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.shardedOrder(d, nShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .collect().map(_.toSeq).toSet
    // the order must not depend on physical layout — that's the whole
    // point of a reproducible shuffle
    assert(run(docs) === run(docs.repartition(7)))
    // positions are a dense 0..count-1 enumeration within each shard
    val per = Sampling.shardedOrder(docs, nShards = 8)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("mn"),
        max(col("pos")).as("mx"), countDistinct(col("pos")).as("nd"))
      .collect()
    assert(per.length === 8) // 500 hashed docs hit all 8 shards
    per.foreach { r =>
      assert(r.getAs[Long]("mn") === 0L)
      assert(r.getAs[Long]("mx") === r.getAs[Long]("n") - 1)
      assert(r.getAs[Long]("nd") === r.getAs[Long]("n"))
    }
  }

  test("leakFreeSplit: zero near-dup pairs cross splits; total partition") {
    import org.apache.spark.sql.functions._
    val d = Tables.load(spark, sf, "documents")
    val pairs = graft.operators.Dedup.minhashPairs(d)
      .select(col("a"), col("b")).cache()
    val split = graft.operators.Sampling.leakFreeSplit(d, pairs).cache()
    // every doc assigned exactly once
    assert(split.count() === d.count())
    assert(split.select("doc_id").distinct().count() === d.count())
    // THE property: no certified near-dup pair straddles two splits
    val sa = split.select(col("doc_id").as("a"), col("split").as("sa"))
    val sb = split.select(col("doc_id").as("b"), col("split").as("sb"))
    val crossed = pairs.join(sa, "a").join(sb, "b")
      .filter(col("sa") =!= col("sb")).count()
    assert(crossed === 0L)
    // d07's plain per-doc hash split DOES leak on this corpus — the
    // contrast that justifies the operator (if it didn't, the fixture
    // wouldn't exercise anything)
    val plain = d.select(col("doc_id"),
      when(graft.functions.CrossHash.md5Long(
          concat(lit("lfs:"), col("text"))) % 100 < 80, "train")
        .otherwise("holdout").as("split"))
    val pa = plain.select(col("doc_id").as("a"), col("split").as("sa"))
    val pb = plain.select(col("doc_id").as("b"), col("split").as("sb"))
    val plainCrossed = pairs.join(pa, "a").join(pb, "b")
      .filter(col("sa") =!= col("sb")).count()
    assert(plainCrossed > 0L)
    pairs.unpersist(); split.unpersist()
  }

  test("domainCap keeps exactly maxPerKey best-scored docs per hot " +
      "domain, deterministic under score ties") {
    import spark.implicits._
    // one hot domain (90 docs, constant score -> pure id tie-break),
    // one small domain under the cap
    val docs = ((1L to 90L).map(i => (i, "hot", 0.5)) ++
      Seq((101L, "cold", 0.9), (102L, "cold", 0.1)))
      .toDF("doc_id", "source", "quality_score")
    val kept = graft.operators.Sampling
      .domainCap(docs, "source", "quality_score", "doc_id", 10)
    val byKey = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey === Map("hot" -> 10L, "cold" -> 2L))
    // constant-score ties resolve to the lowest ids, rank follows ids
    val hot = kept.filter(col("source") === "hot")
      .orderBy(col("src_rank")).collect()
    assert(hot.map(_.getLong(0)).toSeq === (1L to 10L))
    // cold ranks by score first
    val cold = kept.filter(col("source") === "cold")
      .orderBy(col("src_rank")).collect().map(_.getLong(0)).toSeq
    assert(cold === Seq(101L, 102L))
  }

  test("systematic sample: exact budget, block-split invariant, " +
      "oversized docs multi-picked") {
    import spark.implicits._
    // skewed widths incl. one doc wider than several strides and a
    // zero-width doc that can never be picked
    val docs = ((1L to 50L).map(i => (i, (i * 13 % 97) + 1)) ++
      Seq((51L, 0L), (52L, 777L))).map { case (i, w) => (i, w.toLong) }
      .toDF("doc_id", "w")
    val stride = 100L
    val totalW = docs.agg(sum("w")).head().getLong(0)
    val out = Sampling.systematicSample(docs, "doc_id", "w", stride,
      numBlocks = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // EXACT budget: total picks == floor(totalW / stride), one per
    // stride of cumulative weight
    assert(out.map(_._4).sum === totalW / stride)
    // the zero-width doc is never picked; the 777-wide doc gets >= 7
    assert(!out.exists(_._1 == 51L))
    assert(out.find(_._1 == 52L).get._4 >= 7L)
    // every pick is justified: span (cum, cum+w] really covers the
    // claimed number of stride multiples
    out.foreach { case (_, w, cum, n) =>
      assert((cum + w) / stride - cum / stride === n)
    }
    // the block split is plan-only: 1 block == 8 blocks == 64 blocks
    for (nb <- Seq(1, 64)) {
      val alt = Sampling.systematicSample(docs, "doc_id", "w", stride, nb)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(alt.toSeq === out.toSeq)
    }
  }
}
