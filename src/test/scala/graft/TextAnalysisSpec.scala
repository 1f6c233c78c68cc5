package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {

  test("token stats on a known sentence") {
    import spark.implicits._
    val df = Seq((1L, "the cat sat on a mat")).toDF("doc_id", "text")
    val r = TextAnalysis.withTokenStats(df).collect()(0)
    assert(r.getAs[Int]("n_tokens") === 6)
    assert(r.getAs[Int]("n_chars_obs") === 20)
    assert(r.getAs[Double]("avg_token_len") === 15.0 / 6)
  }

  test("lang id picks the marker-dominant language with deterministic ties") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog"),   // en
      (2L, "der hund und die katze"), // de
      (3L, "xyzzy qwerty"),           // no markers -> und
      (4L, "the der"))                // tie en/de -> de (lexicographic)
      .toDF("doc_id", "text")
    val out = TextAnalysis.withLangId(df).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("lang_pred")).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "und")
    assert(out(4L) === "de")
  }

  test("quality score is bounded and monotone in length") {
    val docs = Tables.load(spark, sf, "documents")
    val q = TextAnalysis.withQuality(docs)
    assert(q.filter(col("quality_score") < 0.0 ||
      col("quality_score") > 1.0).count() === 0)
    assert(q.filter(col("stop_ratio") < 0.0 ||
      col("stop_ratio") > 1.0).count() === 0)
  }

  test("fingerprint is whitespace/case canonical") {
    import spark.implicits._
    val df = Seq((1L, "Hello  World"), (2L, "hello world"),
      (3L, " hello   WORLD "))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.withFingerprint(df)
      .select("fp_md5").distinct().count()
    assert(fps === 1)
  }

  test("passage chunks cover every token with the declared overlap") {
    import spark.implicits._
    val toks = (0 until 100).map(i => s"w$i")
    val df = Seq((1L, toks.mkString(" ")), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.passageChunks(df, window = 16, stride = 12)
      .collect().groupBy(_.getLong(0))
    // 100 tokens -> 1 + ceil(84/12) = 8 passages; short docs -> 1 passage
    assert(out(1L).length === 8)
    assert(out(2L).length === 1 && out(2L)(0).getAs[String]("passage") === "a b c")
    assert(out(3L).length === 1)
    val ps = out(1L).sortBy(_.getAs[Int]("passage_idx"))
    // starts advance by stride; consecutive passages overlap by 4 tokens
    assert(ps.map(_.getAs[Int]("start_tok")).toSeq === (0 until 8).map(_ * 12))
    // coverage: every token appears in at least one passage
    val seen = ps.flatMap(_.getAs[String]("passage").split(" ")).toSet
    assert(seen === toks.toSet)
    // each passage is the exact window slice
    ps.foreach { r =>
      val s = r.getAs[Int]("start_tok")
      assert(r.getAs[String]("passage") ===
        toks.slice(s, s + 16).mkString(" "))
      assert(r.getAs[Int]("n_ptokens") === math.min(16, 100 - s))
    }
  }

  test("decontamination flags exactly the n-gram-overlapping training docs") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),   // contains eval run
      (2L, "a completely unrelated training document"),
      (3L, "short doc"))                                 // < 5 words
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "xx alpha beta gamma delta epsilon yy"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(train, eval_).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(out(1L)._2 && out(1L)._1 === 1) // one shared 5-gram
    assert(!out(2L)._2 && out(2L)._1 === 0)
    assert(!out(3L)._2) // whole-text shingle not present in eval
    assert(out.size === 3) // every training doc reported, hit or not
  }

  test("bloom decontamination == exact path, bounded false-positive gating") {
    val d = Tables.load(spark, sf, "documents")
    val train = d.filter(col("doc_id") % 97 =!= 1)
    val eval_ = d.filter(col("doc_id") % 97 === 1)
    val exact = TextAnalysis.decontaminate(train, eval_).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    val bloomDf = TextAnalysis.decontaminateBloom(train, eval_)
    val bloom = bloomDf.collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(2), r.getInt(3)))).toMap
    // identical verdicts: no false negatives, confirm join kills the FPs
    assert(bloom.keySet === exact.keySet)
    exact.foreach { case (id, (n, c)) =>
      assert(bloom(id)._1 === n, s"doc $id n_hits")
      assert(bloom(id)._2 === c, s"doc $id contaminated")
      assert(bloom(id)._3 >= n, s"doc $id candidates must cover hits")
    }
    // the gate does its job: at 8 bits/gram the bloom's false-positive
    // rate is ~2%; allow 5% of checked grams before calling it broken.
    // n_bloom_candidates (carried through the confirm join) minus true
    // hits = the false positives the exact confirm join had to absorb.
    val candGrams = bloom.valuesIterator.map(_._3.toLong).sum
    val totalHits = exact.valuesIterator.map(_._1.toLong).sum
    assert(candGrams >= totalHits, "candidates must cover all true hits")
    val checked = TextAnalysis.withTokenStats(train)
      .agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    val fps = candGrams - totalHits
    assert(fps <= math.max(10L, checked / 20),
      s"bloom passed $fps false positives over ~$checked grams")
  }

  test("bloom decontamination on an empty eval corpus flags nothing") {
    import spark.implicits._
    val train = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    Seq(TextAnalysis.decontaminate(train, empty),
        TextAnalysis.decontaminateBloom(train, empty)
          .select("doc_id", "n_hits", "contaminated")).foreach { res =>
      val r = res.collect()
      assert(r.length === 1)
      assert(r(0).getInt(1) === 0 && !r(0).getBoolean(2))
    }
  }

  test("bpe training learns the classic merges on the Sennrich fixture") {
    import spark.implicits._
    // word freqs: low x5, lower x2, newest x6, widest x3
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest newest"),
      (3L, "newest newest newest widest widest widest")
    ).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // iter1: (e,s)=9 ties (s,t)=9 -> lexicographic; iter2: (es,t)=9;
    // iter3: (l,o)=7 ties (o,w)=7 -> lexicographic
    assert(merges(0) === ((1, "e", "s", 9L)))
    assert(merges(1) === ((2, "es", "t", 9L)))
    assert(merges(2) === ((3, "l", "o", 7L)))
  }

  test("bpe merges only whole symbols, never inside earlier merges") {
    import spark.implicits._
    // after merging (a,b): 'abc' = [ab, c]; a bare-separator replace
    // would then let (b,c) falsely merge [ab, c] into one symbol [abc],
    // leaving nothing for iteration 3 — the boundary marks prevent it
    val docs = Seq(
      (1L, Seq.fill(10)("ab").mkString(" ")),
      (2L, Seq.fill(6)("bc").mkString(" ")),
      (3L, Seq.fill(3)("abc").mkString(" "))
    ).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, nMerges = 3).orderBy("merge_rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m(0) === ((1, "a", "b", 13L)))
    assert(m(1) === ((2, "b", "c", 6L)))  // only the 'bc' words
    assert(m(2) === ((3, "ab", "c", 3L))) // [ab, c] survived intact
    // greedy-left on runs: [b,b,b,b] + (b,b) -> [bb, bb], not [bb, b, b]
    val runs = Seq((1L, "bbbb bbbb")).toDF("doc_id", "text")
    val rm = TextAnalysis.bpeTrain(runs, nMerges = 2).orderBy("merge_rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rm(0) === ((1, "b", "b", 6L)))
    assert(rm(1) === ((2, "bb", "bb", 2L)))
  }

  test("selectSafeBatch accepts multiple disjoint merges from one table " +
      "and stops exactly where a recount could disagree") {
    // disjoint top pairs: all three accepted from ONE count job
    assert(TextAnalysis.selectSafeBatch(
      Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L)), 64, 10)
      === Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L)))
    // an affected pair (shares 'h') caps later acceptance: (x,y)=5 does
    // not STRICTLY exceed the affected (h,e)=9, which a recount could
    // leave at 9 and rank first -> stop after the argmax
    assert(TextAnalysis.selectSafeBatch(
      Seq(("t", "h", 10L), ("h", "e", 9L), ("x", "y", 5L)), 64, 10)
      === Seq(("t", "h", 10L)))
    // tie with an affected pair: (c,d)=10 equals affected (a,m)=10; after
    // the recount (a,m) could still be 10 and wins lexicographically, so
    // only the argmax is safe
    assert(TextAnalysis.selectSafeBatch(
      Seq(("m", "n", 12L), ("a", "m", 10L), ("c", "d", 10L)), 64, 10)
      === Seq(("m", "n", 12L)))
    // truncated table: with kLimit == length, unseen pairs may count up
    // to the last row's 6, so (e,f)=6 is not strictly above it -> stop
    assert(TextAnalysis.selectSafeBatch(
      Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L)), 3, 10)
      === Seq(("a", "b", 10L), ("c", "d", 8L)))
    // maxAccept caps the batch
    assert(TextAnalysis.selectSafeBatch(
      Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L)), 64, 1)
      === Seq(("a", "b", 10L)))
    // ADVICE r9 tie hole: the affected pair sits AFTER the candidate in
    // table order with an EQUAL count — merging (a,z) can spawn
    // ((az,y),10) which sorts lexicographically before (c,d) on the
    // recount ("az" < "c"), so accepting (c,d) would diverge from
    // sequential greedy; the scan must cover the whole table
    assert(TextAnalysis.selectSafeBatch(
      Seq(("a", "z", 12L), ("c", "d", 10L), ("z", "y", 10L)), 64, 10)
      === Seq(("a", "z", 12L)))
    // same shape but the post-candidate affected count is strictly
    // BELOW the candidate: any pair it spawns counts <= 9 < 10, so
    // (c,d) is still the recount argmax and acceptance is safe
    assert(TextAnalysis.selectSafeBatch(
      Seq(("a", "z", 12L), ("c", "d", 10L), ("z", "y", 9L)), 64, 10)
      === Seq(("a", "z", 12L), ("c", "d", 10L)))
    // accepted merges are excluded from the affected scan (their recount
    // count is 0): (a,b)=10 accepted must not cap (c,d)=8
    assert(TextAnalysis.selectSafeBatch(
      Seq(("a", "b", 10L), ("c", "d", 8L)), 64, 10)
      === Seq(("a", "b", 10L), ("c", "d", 8L)))
    // ADVICE r10 self-pair hole: accepted (a,a) must KEEP bounding later
    // candidates — merging (a,a) on 3+ runs spawns (aa,a)/(aa,aa) whose
    // only pre-merge witness is (a,a) itself (words {aaaa ×5, cd ×3}:
    // sequential greedy's 2nd merge is ((aa,aa),5), not (c,d))
    assert(TextAnalysis.selectSafeBatch(
      Seq(("a", "a", 15L), ("c", "d", 3L)), 64, 10)
      === Seq(("a", "a", 15L)))
    // a disjoint self-pair AFTER a distinct-symbol merge is still safe:
    // (c,d)'s spawned pairs are bounded by table pairs sharing c/d, of
    // which there are none, so (a,a)=15 is the recount argmax too
    assert(TextAnalysis.selectSafeBatch(
      Seq(("c", "d", 20L), ("a", "a", 15L)), 64, 10)
      === Seq(("c", "d", 20L), ("a", "a", 15L)))
    // and a distinct-symbol accepted merge still doesn't self-cap
    // even when a self-pair appears later, unaffected
    assert(TextAnalysis.selectSafeBatch(
      Seq(("a", "b", 10L), ("z", "z", 4L)), 64, 10)
      === Seq(("a", "b", 10L), ("z", "z", 4L)))
  }

  test("batched bpe == sequential greedy on a self-merge run corpus " +
      "(ADVICE r10 counterexample, both ways)") {
    import spark.implicits._
    // {aaaa ×5, cd ×3}: pair table [(a,a,15),(c,d,3)] — the batch must
    // accept ONLY (a,a); merge 2 is then (aa,aa) count 5, merge 3 (c,d).
    val docs = Seq.tabulate(5)(i => (i.toLong, "aaaa")) ++
      Seq.tabulate(3)(i => (100L + i, "cd"))
    val df = docs.toDF("doc_id", "text")
    val batched = TextAnalysis.bpeTrain(df, nMerges = 3)
      .orderBy("merge_rank").collect().map(_.toSeq)
    val sequential = TextAnalysis.bpeTrain(df, nMerges = 3, topK = 1)
      .orderBy("merge_rank").collect().map(_.toSeq)
    assert(batched.toSeq === sequential.toSeq)
    assert(batched.map(r => (r(1), r(2), r(3))).toSeq ===
      Seq(("a", "a", 15L), ("aa", "aa", 5L), ("c", "d", 3L)))
  }

  test("batched bpe training (topK=64) is bit-identical to sequential " +
      "greedy (topK=1) on the real corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val batched = TextAnalysis.bpeTrain(docs, nMerges = 6)
      .orderBy("merge_rank").collect().map(_.toSeq)
    val sequential = TextAnalysis.bpeTrain(docs, nMerges = 6, topK = 1)
      .orderBy("merge_rank").collect().map(_.toSeq)
    assert(batched.toSeq === sequential.toSeq)
    assert(batched.length === 6)
  }

  test("bigram LM scores by smoothed average log-probability") {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val train = Seq((0L, "a b a c")).toDF("doc_id", "text")
    val docsDf = Seq((1L, "a b"), (2L, "z q"), (3L, "q"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docsDf, train).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // train "a b a c": V=3, c(a)=2, c(a,b)=1 -> p(b|a) = (1+1)/(2+3)
    assert(out(1L) === ((1L, r6(math.log(2.0 / 5.0)))))
    // fully unseen bigram: (0+1)/(0+3)
    assert(out(2L) === ((1L, r6(math.log((0 + 1.0) / (0 + 3))))))
    // under two words: defined zero, not NULL
    assert(out(3L) === ((0L, 0.0)))
  }

  test("native feature buckets == declarative md5 formulation") {
    val d = Tables.load(spark, sf, "documents")
    val a = d.select(col("doc_id"), graft.functions.TextFunctions
        .feature_buckets(col("text"), 256).as("b")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val b = d.select(col("doc_id"),
        TextAnalysis.featureBucketsHof(col("text"), 256).as("b"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(a.toSeq === b.toSeq)
  }

  test("hashed linear quality score: feature counts, sign, determinism") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"), // 3 unigrams + 2 bigrams = 5 features
      (2L, "solo")              // a single token has no bigrams
    ).toDF("doc_id", "text")
    def const(w: Double) = spark.range(0, 64)
      .select(col("id").cast("int").as("bucket"),
        lit(w).cast(org.apache.spark.sql.types.DecimalType(9, 3)).as("weight"))
    // constant weights isolate the feature count: logit = w * n_features
    val pos = TextAnalysis.qualityScore(docs, const(0.5), 64).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(pos(1L) === ((2.5, 0.5, true)))
    assert(pos(2L) === ((0.5, 0.5, true)))
    val neg = TextAnalysis.qualityScore(docs, const(-0.5), 64).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(neg(1L) === false && neg(2L) === false)
    // a SPARSE weight table (pruned zero rows) must not drop docs whose
    // buckets all miss, nor shrink the mean's denominator
    val empty = spark.range(0, 0)
      .select(col("id").cast("int").as("bucket"),
        lit(1.0).cast(org.apache.spark.sql.types.DecimalType(9, 3))
          .as("weight"))
    val sparse = TextAnalysis.qualityScore(docs, empty, 64).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(sparse.keySet === Set(1L, 2L)) // both docs still reported
    assert(sparse(1L) === ((0.0, 0.0)))   // 5 features, all weight 0
    // real (varying) weights are deterministic across runs
    val w = spark.range(0, 64).select(col("id").cast("int").as("bucket"),
      (((col("id") * 37) % 201 - 100) / 100.0)
        .cast(org.apache.spark.sql.types.DecimalType(9, 3)).as("weight"))
    val d = Tables.load(spark, sf, "documents")
    val a = TextAnalysis.qualityScore(d, w, 64).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = TextAnalysis.qualityScore(d, w, 64).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }

  test("winnowing selects per-window gram minima with full window coverage") {
    import spark.implicits._
    import graft.functions.CrossHash.md5Long
    val long = "the quick brown fox jumps over the lazy dog"
    val df = Seq((1L, "abcdefghij"), (2L, "tiny"), (3L, long))
      .toDF("doc_id", "text")
    val out = TextAnalysis.withWinnowing(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](r.fieldIndex("fps"))).toMap
    def gramHashes(s: String): Seq[Long] =
      spark.range(1).select(
        (1 to s.length - 7).map(i =>
          md5Long(lit(s.substring(i - 1, i + 7)))): _*)
        .collect()(0).toSeq.map(_.asInstanceOf[Long])
    // 10 chars → 3 grams ≤ w=4 → single fingerprint: the global min
    assert(out(1L) === Seq(gramHashes("abcdefghij").min))
    // short text (< k chars) → one whole-text fingerprint
    val tiny = spark.range(1).select(md5Long(lit("tiny")))
      .collect()(0).getLong(0)
    assert(out(2L) === Seq(tiny))
    // winnowing guarantee: every window of w=4 grams contains a selected fp
    val grams = gramHashes(long)
    val fps = out(3L).toSet
    grams.sliding(4).foreach { win =>
      assert(win.exists(fps.contains), s"uncovered window $win")
    }
    // and every selected fp IS some window's minimum
    val mins = grams.sliding(4).map(_.min).toSet
    assert(fps.subsetOf(mins))
  }

  test("repetition filters flag degenerate documents and keep healthy ones") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),       // all dup
      (2L, "a healthy sentence with entirely distinct words here"),
      (3L, "12 34 56 78 90 11 22"),                          // no alpha words
      (4L, "too short"))                                     // < 5 words
      .toDF("doc_id", "text")
    val r = TextAnalysis.withRepetitionStats(df).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Double]("frac_dup_words") === 7.0 / 8)
    assert(r(1L).getAs[Double]("top_word_frac") === 1.0)
    assert(r(1L).getAs[Double]("dup_bigram_frac") === 6.0 / 7)
    assert(!r(1L).getAs[Boolean]("keep"))
    assert(r(2L).getAs[Double]("frac_dup_words") === 0.0)
    assert(r(2L).getAs[Boolean]("keep"))
    assert(r(3L).getAs[Double]("frac_words_alpha") === 0.0)
    assert(!r(3L).getAs[Boolean]("keep"))
    assert(!r(4L).getAs[Boolean]("keep"))
  }

  test("redaction replaces urls and emails and counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact bob@example.com or visit https://example.com/a?b=c now"),
      (2L, "mail root@host.org and sue@x.io twice"),
      (3L, "no pii here at all"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.withRedaction(df).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Int]("n_urls") === 1)
    assert(r(1L).getAs[Int]("n_emails") === 1)
    assert(r(1L).getAs[String]("clean_text") ===
      "contact <EMAIL> or visit <URL> now")
    assert(r(2L).getAs[Int]("n_emails") === 2)
    assert(r(2L).getAs[String]("clean_text") ===
      "mail <EMAIL> and <EMAIL> twice")
    assert(r(3L).getAs[String]("clean_text") === "no pii here at all")
  }

  test("multimodal metadata is deterministic and bounded") {
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val m = Multimodal.withMediaMeta(docs).cache()
    assert(m.filter(col("width") < 0 || col("width") >= 1280).count() === 0)
    assert(m.filter(col("height") < 0 || col("height") >= 720).count() === 0)
    assert(m.select("media_type").distinct().count() <= 3)
  }

  test("multimodal metadata and frames use byte semantics on non-ASCII text") {
    import spark.implicits._
    val txt = "héllo wörld 中文 payload" // 22 chars, 28 UTF-8 bytes
    val df = Seq((1L, txt)).toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val m = Multimodal.withMediaMeta(df).collect()(0)
    assert(m.getAs[Long]("n_bytes") ===
      txt.getBytes("UTF-8").length.toLong) // bytes, not chars
    // Frame windows are byte windows; the fingerprint hashes the hex
    // encoding so a split codepoint can't corrupt it. Reproduce frame 1
    // by hand from the raw bytes.
    val frames = Multimodal.withFrameSamples(df).collect()
      .map(r => r.getAs[Int]("frame_idx") -> r.getAs[String]("frame_md5"))
      .toMap
    val bytes = txt.getBytes("UTF-8")
    val stride = math.max(1, bytes.length / 4)
    val slice = bytes.slice(stride, math.min(stride + 16, bytes.length))
    val hex = slice.map("%02X".format(_)).mkString
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(hex.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(frames(1) === expected)
  }

  test("stub decoder features are md5-derived (oracle-reproducible)") {
    import spark.implicits._
    val txt = "stub decode determinism probe"
    val df = Seq((7L, txt)).toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val f = Multimodal.decodeFeatures(df).collect()(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(b: Array[Byte]): Long = {
      val d = md.digest(b)
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
      v >>> 4
    }
    val h = h60(txt.getBytes("UTF-8"))
    assert(f.width === (h % 1280).toInt)
    assert(f.brightness === (h % 1000) / 1000.0)
    assert(f.n_patches === txt.getBytes("UTF-8").length / 256 + 1)
  }

  test("stub resize downsamples bytes with a reproducible fingerprint") {
    import spark.implicits._
    val txt = "héllo wörld 中文 resize probe" // multibyte: byte semantics
    val df = Seq((1L, txt)).toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val r = Multimodal.resizeStub(df).collect()(0)
    val bytes = txt.getBytes("UTF-8")
    assert(r.src_bytes === bytes.length.toLong)
    assert(r.dst_bytes === ((bytes.length - 1) / 4 + 1).toLong)
    val dst = Array.range(0, bytes.length, 4).map(bytes(_))
    val hx = dst.map(b => f"${b & 0xFF}%02X").mkString
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest(hx.getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString
    assert(r.resized_md5 === expected)
  }

  test("normalizeForDedup folds case, punctuation, digits and whitespace") {
    import spark.implicits._
    val pairsSame = Seq(
      ("Hello, World!", "hello world"),
      ("page 17 of 42", "Page 99 of 100"),
      ("a\t b\nc", " a b c "),
      ("Preis: 12,50 EUR", "preis 0 0 eur"))
    val pairsDiff = Seq(
      ("foo bar", "foo baz"),
      ("un deux", "un deux trois"))
    val norm = (pairsSame ++ pairsDiff).flatMap(p => Seq(p._1, p._2))
      .toDF("t")
      .select(col("t"), TextAnalysis.normalizeForDedup(col("t")).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    pairsSame.foreach { case (a, b) =>
      assert(norm(a) === norm(b), s"'$a' vs '$b'") }
    pairsDiff.foreach { case (a, b) =>
      assert(norm(a) !== norm(b), s"'$a' vs '$b'") }
    // non-Latin letters survive (Unicode \p{L}), so zh text doesn't
    // collapse into one group
    val zh = Seq("你好 世界", "再见 世界").toDF("t")
      .select(TextAnalysis.normalizeForDedup(col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(zh(0) !== zh(1))
    assert(zh(0).nonEmpty)
  }

  test("oov rate: top-k vocabulary is deterministic, counts exact") {
    import spark.implicits._
    // corpus term counts: a×5, b×4, c×3, d×1, e×1 → vocab(3) = {a, b, c}
    val fixture = Seq(
      (1L, "a a b b c"),
      (2L, "a a b c c d"),
      (3L, "a b e")).toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(fixture, vocabSize = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got(1L) === ((5L, 0L, 0.0)))
    assert(got(2L) === ((6L, 1L, BigDecimal(1.0 / 6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(3L) === ((3L, 1L, BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // ties at the vocab boundary break by term asc: with size 4 the
    // d/e tie (count 1 each) admits 'd', not 'e'
    val got4 = TextAnalysis.oovRate(fixture, vocabSize = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got4(2L) === 0L) // 'd' now in vocab
    assert(got4(3L) === 1L) // 'e' still out
  }

  test("source overlap: shared distinct grams and coverage fractions") {
    import spark.implicits._
    val S = (1 to 8).map("s" + _).mkString(" ")  // exactly one 8-gram
    val T = (1 to 9).map("t" + _).mkString(" ")  // two 8-grams
    val fixture = Seq(
      ("s1", s"$S"),          // srcA: gram set {S}
      ("s2", s"$S"),          // srcB: {S} — shares S with s1
      ("s2", s"$T"),          // ... plus T's two grams → s2 has 3 distinct
      ("s3", (1 to 10).map("z" + _).mkString(" "))) // disjoint
      .toDF("source", "text")
    val got = TextAnalysis.sourceOverlap(fixture).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === Set(("s1", "s2")))
    assert(got(("s1", "s2")) === ((1L, 1.0, 0.333333)))
  }

  test("kl drift: matches hand recompute; corpus-like source scores lowest") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "a a b c", "s_mix"),   // mirrors the corpus mix
      (2L, "a a b c", "s_mix"),
      (3L, "a a a a", "s_skew"),  // all mass on one term
      (4L, "c c c b", "s_other")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.klDrift(fixture, vocabSize = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // hand recompute: corpus counts a=8 c=5 b=3 (vocab=3, all terms),
    // nq=16; per source p=(cs+1)/(ns+3), q=(cq+1)/(nq+3)
    val cq = Map("a" -> 8L, "b" -> 3L, "c" -> 5L)
    val nq = 16L
    def kl(cs: Map[String, Long]): Double = {
      val ns = cs.values.sum
      val s = cs.keys.toSeq.sorted.foldLeft(0.0) { (acc, t) =>
        val p = (cs(t) + 1).toDouble / (ns + 3)
        val q = (cq(t) + 1).toDouble / (nq + 3)
        acc + p * math.log(p / q)
      }
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got("s_mix") ===
      ((8L, kl(Map("a" -> 4L, "b" -> 2L, "c" -> 2L)))))
    assert(got("s_skew") === ((4L, kl(Map("a" -> 4L, "b" -> 0L, "c" -> 0L)))))
    assert(got("s_other") === ((4L, kl(Map("a" -> 0L, "b" -> 1L, "c" -> 3L)))))
    // the corpus-like source drifts least; every KL is non-negative
    assert(got("s_mix")._2 < got("s_skew")._2)
    assert(got("s_mix")._2 < got("s_other")._2)
    got.values.foreach { case (_, k) => assert(k >= 0.0) }
  }

  test("fuzzy decontamination flags near-dup eval leakage the exact " +
      "n-gram path can miss") {
    import spark.implicits._
    val evalText = (1 to 40).map("e" + _).mkString(" ")
    // one token changed out of 40: every 5-gram window around position 20
    // differs, but 15/16 minhash values typically survive
    val nearDup = (1 to 40).map(i => if (i == 20) "XX" else "e" + i)
      .mkString(" ")
    val unrelated = (1 to 40).map("u" + _).mkString(" ")
    val train = Seq((1L, nearDup), (2L, unrelated), (3L, evalText))
      .toDF("doc_id", "text")
    val ev = Seq((100L, evalText)).toDF("doc_id", "text")
    val got = TextAnalysis.decontaminateFuzzy(train, ev).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got(3L), "verbatim copy must be flagged")
    assert(got(1L), "one-token paraphrase must be flagged")
    assert(!got(2L), "unrelated doc must not be flagged")
    // empty eval corpus: nothing flagged, every train doc still present
    val none = TextAnalysis.decontaminateFuzzy(train, ev.filter(lit(false)))
      .collect()
    assert(none.length === 3 && none.forall(!_.getBoolean(2)))
  }

  test("mad outliers: planted spike flagged, bulk untouched, mad=0 " +
      "degenerates to any-deviation") {
    import spark.implicits._
    val bulk = (1L to 50L).map(i => (i, "a", 10.0 + (i % 5)))
    val rows = (bulk :+ ((99L, "a", 1000.0)) :+ ((100L, "b", 7.0))
      :+ ((101L, "b", 7.0)) :+ ((102L, "b", 7.1)))
      .toDF("event_id", "event_type", "value")
    val got = TextAnalysis.madOutliers(rows, "event_type", "value",
      "event_id").collect().map(_.getLong(0)).toSet
    assert(got.contains(99L), "spike must be flagged")
    assert(!bulk.map(_._1).exists(got.contains), "bulk must pass")
    // key b: median 7, MAD 0 -> the 7.1 row deviates and is flagged
    assert(got.contains(102L) && !got.contains(100L) && !got.contains(101L))
  }

  test("vocab growth: totals equal corpus-wide truths for ANY bucket size") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val toks = docs.select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val totalTokens = toks.count()
    val totalVocab = toks.distinct().count()
    for (b <- Seq(7, 50)) {
      val rows = TextAnalysis.vocabGrowth(docs, bucketDocs = b)
        .orderBy(col("bucket")).collect()
      val last = rows.last
      assert(last.getAs[Long]("cum_tokens") === totalTokens, s"b=$b")
      assert(last.getAs[Long]("vocab_size") === totalVocab, s"b=$b")
      // running totals are the prefix sums of the per-bucket columns
      val cumT = rows.scanLeft(0L)(_ + _.getAs[Long]("n_tokens")).drop(1)
      val cumV = rows.scanLeft(0L)(_ + _.getAs[Long]("new_terms")).drop(1)
      assert(rows.map(_.getAs[Long]("cum_tokens")).toSeq === cumT.toSeq)
      assert(rows.map(_.getAs[Long]("vocab_size")).toSeq === cumV.toSeq)
      // growth is monotone and saturating-corpus-shaped: the first bucket
      // introduces the most terms of any bucket
      assert(rows.head.getAs[Long]("new_terms") ===
        rows.map(_.getAs[Long]("new_terms")).max)
    }
  }

  test("unicode normalization: NFC composes, strip_accents folds Latin " +
      "accents but keeps non-decomposable letters, nulls pass through") {
    import spark.implicits._
    import graft.functions.TextFunctions.{nfc_normalize, strip_accents}
    val decomposed = "Café"          // e + combining acute
    val composed = "Café"             // precomposed é
    val df = Seq(
      (1L, decomposed),
      (2L, composed),
      (3L, "ﬁn øre"),            // fi ligature + ø: untouched
      (4L, "Ångström"),
      (5L, null.asInstanceOf[String])).toDF("id", "text")
    val out = df.select(col("id"), nfc_normalize(col("text")).as("nfc"),
        strip_accents(col("text")).as("st"))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[String]("nfc"), r.getAs[String]("st"))).toMap
    assert(out(1L)._1 === composed)        // NFC re-composes
    assert(out(2L)._1 === composed)        // already-NFC is identity
    assert(out(1L)._2 === "Cafe")
    assert(out(2L)._2 === "Cafe")
    assert(out(3L)._2 === "ﬁn øre") // no Mn to strip
    assert(out(4L)._2 === "Angstrom")
    assert(out(5L) === (null, null))
    // two byte-different spellings of the same text collide after NFC —
    // the property exact-dedup needs
    assert(out(1L)._1 === out(2L)._1)
  }

  test("normalizeText cleans control chars, collapses whitespace and " +
      "lowercases after accent folding") {
    import spark.implicits._
    val df = Seq((1L, "AB\t C  D é")).toDF("doc_id", "text")
    val r = TextAnalysis.normalizeText(df).collect()(0)
    // the BEL between A and B becomes a space (control chars -> ' ',
    // then runs collapse), so every token separates
    assert(r.getAs[String]("cleaned") === "a b c d e")
  }

  test("semantic decontamination flags a word-permuted paraphrase the " +
      "n-gram detectors under-score; unrelated docs stay clean") {
    import spark.implicits._
    import graft.operators.Similarity
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about spark query planning"),
      (107L, "tonight the lazy dog jumps over the quick brown fox"))
      .toDF("doc_id", "text")
    val v = Similarity.sifVectors(docs)
    val out = TextAnalysis.decontaminateSemantic(
        v.filter(col("doc_id") % 10 =!= 7),
        v.filter(col("doc_id") % 10 === 7), "doc_id", "vec", 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getBoolean(2))).toMap
    // doc 1 is a word permutation of eval doc 107: SIF is a bag-of-words
    // mean, so the vectors are identical -> cosine 1.0
    assert(out(1L)._1 === 1.0 && out(1L)._2)
    assert(!out(2L)._2)
    // every training doc is scored, hit or not
    assert(out.size === 2)
  }

  test("payload simhash: identical payloads hash identically (hamming 0), " +
      "a one-chunk edit stays near, unrelated payloads don't pair") {
    import spark.implicits._
    val base = ("A" * 300) + ("B" * 300) + ("C" * 300)
    val oneChunkEdit = ("A" * 300) + ("B" * 140) + ("X" * 20) +
      ("B" * 140) + ("C" * 300)
    val unrelated = (0 until 900).map(i => ('a' + (i * 7 % 26)).toChar)
      .mkString
    val docs = Seq((1L, base), (2L, base), (3L, oneChunkEdit),
      (4L, unrelated)).toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val sh = Multimodal.payloadSimhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sh(1L) === sh(2L))
    val pairs = Multimodal.payloadSimhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 === 1L && p._2 === 2L && p._3 === 0))
    // the unrelated payload pairs with nothing
    assert(!pairs.exists(p => p._1 === 4L || p._2 === 4L))
  }

  test("stub decoder runs batched per partition and keeps every row") {
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val feats = Multimodal.decodeFeatures(docs)
    assert(feats.count() === docs.count())
    val one = feats.filter(col("doc_id") === 0).collect()(0)
    val again = Multimodal.decodeFeatures(docs)
      .filter(col("doc_id") === 0).collect()(0)
    assert(one === again)
  }

  test("count-min sketch: estimates are one-sided even under forced " +
      "collisions; exact at generous width") {
    import spark.implicits._
    val fixture = (Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++
      (1 to 60).map(i => s"cold$i")).mkString(" ")
    val docs = Seq((1L, fixture)).toDF("doc_id", "text")
    // width 4 forces heavy collisions: the one-sided bound must hold
    val tight = TextAnalysis.cmsEstimates(docs, depth = 3, width = 4,
      topK = 5).collect()
    tight.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: cms ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // a wide grid separates this tiny vocabulary: estimates go exact
    val wide = TextAnalysis.cmsEstimates(docs, depth = 3, width = 65536,
      topK = 5).collect()
    wide.foreach(r => assert(r.getLong(2) === r.getLong(1)))
    assert(wide.map(r => r.getString(0) -> r.getLong(1)).toMap
      .get("hot").contains(50L))
  }

  test("lexical diversity: hand-computed TTR/hapax/entropy on a known " +
      "string; all-whitespace rows dropped") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb aa cc"), (2L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalDiversity(docs).collect()
    assert(out.length === 1) // the whitespace-only row has no tokens
    val r = out.head
    assert(r.getAs[Long]("n_words") === 4L)
    assert(r.getAs[Long]("n_types") === 3L)
    assert(r.getAs[Double]("ttr") === 0.75)
    // hapax: bb, cc of 3 types
    assert(r.getAs[Double]("hapax_rate") ===
      BigDecimal(2.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // chars of "aa bb aa cc": space×3, a×4, b×2, c×2 of 11 — summed in
    // sorted-char order (space < letters), mirroring the operator's fold
    def term(k: Int) = (k / 11.0) * math.log(k / 11.0)
    val exp = BigDecimal(-(((0.0 + term(3)) + term(4)) + term(2) + term(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("char_entropy") === exp)
  }

  test("lexical diversity matches a driver-side reference on the fixture") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.load(spark, sf, "documents")
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.lexicalDiversity(docs).collect()
    assert(got.length === texts.count(_._2.split("\\s+").exists(_.nonEmpty)))
    got.foreach { row =>
      val text = texts(row.getAs[Long]("doc_id"))
      val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty).sorted
      val wordRuns = words.groupBy(identity)
      assert(row.getAs[Long]("n_words") === words.length.toLong)
      assert(row.getAs[Long]("n_types") === wordRuns.size.toLong)
      assert(row.getAs[Double]("ttr") ===
        r6(wordRuns.size.toDouble / words.length))
      assert(row.getAs[Double]("hapax_rate") ===
        r6(wordRuns.count(_._2.length == 1).toDouble / wordRuns.size))
      // entropy: fold run terms in sorted-char order, like the operator
      val chars = text.split("").filter(_.nonEmpty).sorted
      val runs = chars.foldLeft(List.empty[(String, Int)]) {
        case ((c, n) :: tl, ch) if c == ch => (c, n + 1) :: tl
        case (acc, ch) => (ch, 1) :: acc
      }.reverse
      val n = chars.length.toDouble
      val ent = runs.foldLeft(0.0) { case (acc, (_, k)) =>
        acc + (k / n) * math.log(k / n)
      }
      assert(row.getAs[Double]("char_entropy") === r6(-ent),
        s"doc ${row.getAs[Long]("doc_id")}")
    }
  }

  test("FIM transform: cut invariants hold on every fixture doc " +
      "(0 <= c1 <= c2 <= n) and the rendering is partitioning-invariant") {
    val d = Tables.load(spark, sf, "documents")
    val got = TextAnalysis.fimTransform(d).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, c1, c2) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("cut1"),
        r.getAs[Long]("cut2"))
      assert(0 <= c1 && c1 <= c2 && c2 <= n,
        s"doc ${r.get(0)}: n=$n c1=$c1 c2=$c2")
    }
    // all three segment-boundary cases occur across the fixture
    assert(got.exists(r => r.getAs[Long]("cut1") == 0) ||
      got.exists(r => r.getAs[Long]("cut2") == r.getAs[Long]("n_tokens")) ||
      got.exists(r => r.getAs[Long]("cut1") == r.getAs[Long]("cut2")))
    def run(p: Int) = TextAnalysis.fimTransform(d.repartition(p))
      .collect().map(r => (r.getLong(0), r.getString(4))).toSeq.sorted
    assert(run(2) === run(9))
  }

  test("span corruption: maskPct=0 is the identity (masked == original " +
      "token stream, zero spans); maskPct=100 collapses each doc to one " +
      "sentinel; sentinel/target structure is consistent and " +
      "partitioning-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.md5
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three")).toDF("doc_id", "text")
    val zero = TextAnalysis.spanCorruption(docs, maskPct = 0).collect()
      .map(r => r.getLong(0) -> r).toMap
    val origMd5 = docs.select(col("doc_id"),
        md5(concat_ws(" ", filter(split(col("text"), "\\s+"),
          x => x =!= ""))).as("m")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    zero.foreach { case (id, r) =>
      assert(r.getAs[Long]("n_masked") === 0L)
      assert(r.getAs[Long]("n_spans") === 0L)
      assert(r.getAs[String]("masked_md5") === origMd5(id))
    }
    val full = TextAnalysis.spanCorruption(docs, maskPct = 100).collect()
      .map(r => r.getLong(0) -> r).toMap
    val sentinelMd5 = spark.sql("SELECT md5('<extra_id_0>')")
      .collect()(0).getString(0)
    full.foreach { case (id, r) =>
      assert(r.getAs[Long]("n_masked") === r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_spans") === 1L)
      assert(r.getAs[String]("masked_md5") === sentinelMd5)
    }
    // default pct: deterministic under repartitioning
    val big = Tables.load(spark, sf, "documents")
    def run(p: Int) = TextAnalysis.spanCorruption(big.repartition(p))
      .collect().map(r => (r.getLong(0), r.getString(4), r.getString(5)))
      .toSeq.sorted
    assert(run(3) === run(11))
  }
}
