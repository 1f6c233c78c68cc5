package graft

import org.apache.spark.sql.functions._

import graft.operators.{Joins, Similarity, TextAnalysis}

/** Round-6 operators: bloom-prefiltered semi join, CCNet line dedup,
  * code-vs-prose routing, hybrid RRF fusion.
  */
class Round6Spec extends SparkSpec {

  import spark.implicits._

  // ---- bloomSemiJoin -----------------------------------------------------

  test("bloomSemiJoin == plain left-semi join (incl. NULL keys, dup keys)") {
    val probe = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, "c"), (3L, "c2"), (null, "n"), (9L, "x"))
      .toDF("k", "payload")
    val build = Seq[(java.lang.Long, String)](
      (1L, "u"), (1L, "v"), (3L, "w"), (null, "nn"), (7L, "z"))
      .toDF("bk", "junk")
    val got = Joins.bloomSemiJoin(probe, build, "k", "bk", expectedKeys = 16)
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet
    val want = probe.join(build, col("k") === col("bk"), "left_semi")
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(got === want)
    assert(got === Set((1L, "a"), (3L, "c"), (3L, "c2")))
  }

  test("bloomSemiJoin with empty build side returns no rows") {
    val probe = Seq((1L, "a")).toDF("k", "p")
    val build = Seq.empty[(Long, String)].toDF("bk", "j")
    assert(Joins.bloomSemiJoin(probe, build, "k", "bk").count() === 0)
  }

  test("bloomSemiJoin agrees with semi join on the fixture (orders/customer)") {
    val orders = Tables.load(spark, sf, "orders")
    val cust = Tables.load(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val got = Joins.bloomSemiJoin(orders, cust, "o_custkey", "c_custkey",
      expectedKeys = 1 << 12).agg(count(lit(1)), sum(col("o_orderkey")))
      .collect()(0)
    val want = orders.join(cust, col("o_custkey") === col("c_custkey"),
      "left_semi").agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    assert(got === want)
  }

  // ---- lineDedup ---------------------------------------------------------

  test("lineDedup drops cross-doc boilerplate lines, keeps unique + blanks") {
    val docs = Seq(
      (1L, "COPYRIGHT\n\nalpha beta\nCOPYRIGHT", "s1"),
      (2L, "COPYRIGHT\ngamma", "s1"),
      (3L, " COPYRIGHT \ndelta", "s1"),
      (4L, "COPYRIGHT\nfrom another source", "s2"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.lineDedup(docs, minDocs = 3)
      .orderBy("doc_id").collect()
    // "COPYRIGHT" (trimmed) appears in docs 1,2,3 of s1 -> dropped there;
    // s2's single occurrence survives. Blanks always survive.
    val d1 = r(0)
    assert(d1.getAs[Long]("n_lines") === 4)
    assert(d1.getAs[Long]("n_kept") === 2) // blank + "alpha beta"
    assert(d1.getAs[Long]("kept_chars") === 10)
    val d4 = r(3)
    assert(d4.getAs[Long]("n_kept") === 2)
    // rebuilt text of doc 1 is "\nalpha beta"
    val md5want = java.security.MessageDigest.getInstance("MD5")
      .digest("\nalpha beta".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(d1.getAs[String]("new_text_md5") === md5want)
  }

  test("lineDedup: doc of only boilerplate keeps nothing; ratio exact") {
    val docs = (1L to 3L).map(i => (i, "SAME", "s")).toDF(
      "doc_id", "text", "source")
    val r = TextAnalysis.lineDedup(docs, minDocs = 3).orderBy("doc_id")
      .collect()
    r.foreach { row =>
      assert(row.getAs[Long]("n_kept") === 0)
      assert(row.getAs[Long]("kept_chars") === 0)
      assert(row.getAs[Double]("retained_ratio") === 0.0)
    }
  }

  test("lineDedup: empty text is a single blank kept line, NULL ratio") {
    val docs = Seq((1L, "", "s")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.lineDedup(docs).collect()(0)
    assert(r.getAs[Long]("n_lines") === 1)
    assert(r.getAs[Long]("n_kept") === 1)
    assert(r.getAs[Long]("total_chars") === 0)
    assert(r.isNullAt(r.fieldIndex("retained_ratio")))
  }

  // ---- codeSignals -------------------------------------------------------

  test("codeSignals flags code-shaped text, passes prose") {
    val code =
      """def f(x):
        |  return x + 1
        |
        |class A {
        |  void g() { h(); }
        |}""".stripMargin
    val prose = "The quick brown fox jumps over the lazy dog. " +
      "It was the best of times, it was the worst of times."
    val r = TextAnalysis.codeSignals(
        Seq((1L, code), (2L, prose)).toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("is_code"))
    assert(!r(1).getAs[Boolean]("is_code"))
    assert(r(1).getAs[Long]("kw_hits") === 0)
    assert(r(0).getAs[Long]("kw_hits") >= 3) // def, return, class, void
  }

  // ---- hybridRrf ---------------------------------------------------------

  test("hybridRrf fuses only members of either top-k, with exact RRF math") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val fused = Similarity.hybridRrf(e, q, k = 10, kEach = 20)
    val rows = fused.collect()
    assert(rows.nonEmpty)
    val cos = Similarity.bruteForceTopK(e, q, k = 20)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val ip = Similarity.mipsTopK(e, q, k = 20)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      val ra = cos.get(key)
      val rb = ip.get(key)
      assert(ra.isDefined || rb.isDefined, s"$key in neither ranking")
      val want = math.rint((ra.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rb.map(x => 1.0 / (60 + x)).getOrElse(0.0)) * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("rrf") - want) < 1e-9)
    }
    // per query: exactly 10 fused rows, ranks 1..10, scores non-increasing
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.length === 10)
      val sorted = g.sortBy(_.getAs[Int]("fused_rank"))
      assert(sorted.map(_.getAs[Int]("fused_rank")).toSeq === (1 to 10))
      val scores = sorted.map(_.getAs[Double]("rrf")).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }

  // ---- payloadNibbleEntropy ---------------------------------------------

  test("payloadNibbleEntropy: constant payload ~0 bits, varied payload more") {
    import graft.operators.Multimodal
    val df = Seq(
      (1L, Array.fill[Byte](64)(0x11)),          // hex = "11"*64 -> 1 symbol
      (2L, (0 until 64).map(_.toByte).toArray),  // spread across symbols
      (3L, Array.empty[Byte]))                   // empty -> NULL entropy
      .toDF("doc_id", "payload")
    val r = Multimodal.payloadNibbleEntropy(df).orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("nibble_entropy") === 0.0)
    assert(r(0).getAs[Long]("n_distinct") === 1)
    assert(r(1).getAs[Double]("nibble_entropy") > 2.0) // near ln(16)=2.77
    assert(r(2).isNullAt(r(2).fieldIndex("nibble_entropy")))
    assert(r(2).getAs[Long]("n_nibbles") === 0)
  }

  // ---- q77 weighted median / q78 gap fill -------------------------------

  test("weighted median matches a driver-side model on the fixture") {
    val rows = SparkEntry.queries("q77_mode_wmedian")(spark, sf).collect()
    val base = Tables.load(spark, sf, "events")
      .select("event_type", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val g = base.filter(_._1 == et).sortBy(x => (x._2, x._3))
      val ws = g.map(x => (x._3 % 7) + 1)
      val tot = ws.sum
      var acc = 0L
      val idx = g.indices.find { i => acc += ws(i); acc * 2 >= tot }.get
      assert(r.getAs[Double]("w_median") === g(idx)._2, et)
      assert(r.getAs[Long]("total_w") === tot, et)
    }
  }

  test("gap fill emits a complete spine: types x days, originals preserved") {
    val r = SparkEntry.queries("q78_gap_fill")(spark, sf)
    val counts = r.groupBy("event_type").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts.values.toSet.size === 1, "all types share the spine")
    val total = r.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total === Tables.load(spark, sf, "events").count())
  }

  test("threshold sweep curve is monotone non-increasing in n_eq") {
    val r = SparkEntry.queries("d35_threshold_sweep")(spark, sf)
      .orderBy("n_eq").collect()
    val atLeast = r.map(_.getAs[Long]("n_pairs_at_least"))
    assert(atLeast.toSeq === atLeast.sorted.reverse)
    assert(atLeast.head === r.map(_.getAs[Long]("n_pairs")).sum)
  }

  test("hybridRrf: candidate in both rankings outranks single-ranking ties") {
    // A neighbor ranked ~r in both lists beats one ranked r in only one.
    val e = Tables.load(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val top = Similarity.hybridRrf(e, q, k = 1, kEach = 20).collect()
    top.foreach { r =>
      // the fused winner must appear in at least one ranking at rank <= 20
      assert(r.getAs[Double]("rrf") >= 1.0 / 80 - 1e-9)
    }
  }
}
