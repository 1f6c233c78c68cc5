package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators._
import graft.sources.KafkaSource

/** Round-8 additions: Pareto/ABC revenue classification, hierarchical
  * share-of-parent rollups, new-vs-returning customer decomposition, a
  * per-label silhouette score over the certified centroid fold, seeded
  * (personalized) PageRank, a per-source character-class composition
  * profile, magic-byte payload sniffing through a broadcast signature
  * table, per-partition throughput quantiles over the replay relation,
  * and a cluster-density audit of the near-dup graph (the chain-collapse
  * forensic). Same oracle discipline as [[Extras]]: exact integer/decimal
  * arithmetic everywhere, doubles only in closed formulas shared
  * token-for-token with the DuckDB oracle, rounded at 6.
  */
object Extras4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dec2 = DecimalType(18, 2)

  private def drev(price: Column, disc: Column): Column =
    price.cast(dec2) * (lit(java.math.BigDecimal.ONE).cast(dec2) -
      disc.cast(dec2))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Pareto/ABC classification of parts by revenue: cumulative revenue
    // share cutoffs at 80% (A) and 95% (B), all comparisons as exact
    // DECIMAL cross-products (cum*100 ≤ tot*80) — no double or truncated
    // rescaling enters the class decision (rev = price × (1−disc) is
    // scale-4 decimal; an integer-cents rescale would silently truncate
    // it and diverge from the oracle near the cutoffs, and cents·20
    // overflows long at the 100 TB total). The part dimension grows
    // linearly with SF (~lineitem/30), so the cumulative sum must NOT
    // be one global window over it (a single task ranking 2×10^10 rows
    // at the 100 TB point): it runs on Packing's two-level block scan
    // ordered by (rev desc, partkey) — decimal addition is exact and
    // associative, so the block split never changes values, and
    // DECIMAL(38) holds 100 TB-scale cum·100 with >15 digits to spare.
    // The grand total rides the block summary (totCol), not
    // Window.partitionBy() and not a second scan.
    "q88_abc_pareto" -> { (s, dir) =>
      // localCheckpoint: the block scan's range-boundary sampling would
      // otherwise re-execute the whole lineitem aggregation; the
      // checkpointed frame is part-dimension-sized
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(drev(col("l_extendedprice"), col("l_discount"))).as("rev"))
        .localCheckpoint(false)
      Packing.exclusivePrefixSumBy(rev,
          Seq(col("rev").desc, col("l_partkey")), "rev", "excl",
          totCol = Some("tot"))
        .withColumn("cum", col("excl") + col("rev"))
        .withColumn("abc_class",
          when(col("cum") * 100 <= col("tot") * 80, "A")
            .when(col("cum") * 100 <= col("tot") * 95, "B")
            .otherwise("C"))
        .groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("rev")).cast("double").as("class_revenue"),
          round(sum(col("rev")).cast("double") /
            max(col("tot")).cast("double"), 6).as("revenue_share"))
        .orderBy(col("abc_class"))
    },

    // Hierarchical share-of-parent: nation revenue as a share of its
    // region and of the world — the drill-down report every BI rollup
    // needs, with exact decimal sums and the two ratios as closed double
    // divisions. Dimensions broadcast; the only fact shuffle is the
    // custkey join + one (region, nation) aggregation.
    "q89_parent_share" -> { (s, dir) =>
      val rev = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("o_totalprice").cast(dec2)).as("rev"))
      rev
        .withColumn("reg_tot",
          sum(col("rev")).over(Window.partitionBy(col("r_name"))))
        .withColumn("tot", sum(col("rev")).over(Window.partitionBy()))
        .select(col("r_name"), col("n_name"),
          col("rev").cast("double").as("nation_revenue"),
          round(col("rev").cast("double") /
            col("reg_tot").cast("double"), 6).as("share_of_region"),
          round(col("rev").cast("double") /
            col("tot").cast("double"), 6).as("share_of_total"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // New-vs-returning decomposition per month: a customer is NEW in
    // their first-ever order month, RETURNING after. One custkey window
    // derives the first month; the monthly rollup splits counts and
    // exact decimal revenue by the flag. At 100 TB: one custkey shuffle
    // (reused by window + distinct), one month-sized aggregation.
    "q90_new_returning" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .withColumn("month", date_trunc("month", col("o_orderdate")))
        .withColumn("first_month",
          min(col("month")).over(Window.partitionBy(col("o_custkey"))))
      o.groupBy(col("month"))
        .agg(
          countDistinct(when(col("month") === col("first_month"),
            col("o_custkey"))).as("n_new_customers"),
          countDistinct(when(col("month") =!= col("first_month"),
            col("o_custkey"))).as("n_returning_customers"),
          coalesce(sum(when(col("month") === col("first_month"),
              col("o_totalprice").cast(dec2))), lit(0).cast(dec2))
            .cast("double").as("new_revenue"),
          coalesce(sum(when(col("month") =!= col("first_month"),
              col("o_totalprice").cast(dec2))), lit(0).cast(dec2))
            .cast("double").as("returning_revenue"))
        .orderBy(col("month"))
    },

    // Per-label simplified silhouette over the certified s05 centroid
    // fold: a = d² to the own-label centroid, b = min d² to any other
    // label's centroid, sil = (b-a)/max(a,b) — the cluster-quality gate
    // before trusting label-conditioned sampling or hard-negative
    // mining. Scale design: centroids (labels × dim) collapse to ONE
    // broadcast row; a and b are array expressions over it — the corpus
    // is touched map-side only, then one label-sized aggregation. The
    // per-label mean folds integer micro-units so it is order-free.
    "s30_silhouette" -> { (s, dir) =>
      Similarity.silhouetteByLabel(t(s, dir, "embeddings"))
        .orderBy(col("label"))
    },

    // Personalized PageRank over the customer↔supplier bipartite graph
    // (g01's edge set), restart mass pinned to the deterministic seed
    // set id % 13 = 0 — the "expand this vetted set" curation primitive.
    // Same scaled-long exact-integer folds as g01; the oracle unrolls
    // the identical three iterations.
    "g13_seed_pagerank" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"),
          (col("l_suppkey") + 1000000L).as("supp"))
      val edges = cs.select(col("cust").as("src"), col("supp").as("dst"))
        .union(cs.select(col("supp").as("src"), col("cust").as("dst")))
      val seeds = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
        .filter(col("id") % 13 === 0)
      Graph.personalizedPageRank(edges, seeds).orderBy(col("id"))
    },

    // Per-source character-class composition: lower/upper/digit/space/
    // other fractions of the character mass — the cheap pre-filter
    // profile (C4-style alpha ratios) computed as exact length
    // differences after class deletion, map-only plus one source-sized
    // aggregation. Ratios are single double divisions rounded at 6.
    "t46_charclass_profile" -> { (s, dir) =>
      def cc(re: String): Column =
        length(col("text")) - length(regexp_replace(col("text"), re, ""))
      val d = t(s, dir, "documents")
        .withColumn("n_all", length(col("text")).cast("long"))
        .withColumn("n_lower", cc("[a-z]").cast("long"))
        .withColumn("n_upper", cc("[A-Z]").cast("long"))
        .withColumn("n_digit", cc("[0-9]").cast("long"))
        .withColumn("n_space",
          (length(col("text")) -
            length(regexp_replace(col("text"), " ", ""))).cast("long"))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_all")).as("total_chars"),
          sum(col("n_lower")).as("sl"), sum(col("n_upper")).as("su"),
          sum(col("n_digit")).as("sd"), sum(col("n_space")).as("ss"))
        .select(col("source"), col("n_docs"), col("total_chars"),
          round(col("sl").cast("double") / col("total_chars"), 6)
            .as("lower_ratio"),
          round(col("su").cast("double") / col("total_chars"), 6)
            .as("upper_ratio"),
          round(col("sd").cast("double") / col("total_chars"), 6)
            .as("digit_ratio"),
          round(col("ss").cast("double") / col("total_chars"), 6)
            .as("space_ratio"),
          round((col("total_chars") - col("sl") - col("su") - col("sd") -
            col("ss")).cast("double") / col("total_chars"), 6)
            .as("other_ratio"))
        .orderBy(col("source"))
    },

    // Magic-byte payload sniffing: the first payload byte (as two hex
    // chars) dispatches against a broadcast signature table — the
    // container-format router every multimodal ingest runs before
    // choosing a decoder. Signatures here are the fixture's synthetic
    // stand-ins (same philosophy as the md5-derived stub decode); the
    // plumbing — hex-prefix extraction, broadcast LEFT join, unknown
    // fallback, share report — is the production shape. Map-only plus a
    // format-sized aggregation.
    "m16_magic_sniff" -> { (s, dir) =>
      import s.implicits._
      val sig = Seq(
        ("73", "fmt_s"), ("74", "fmt_t"), ("63", "fmt_c"),
        ("61", "fmt_a"), ("66", "fmt_f"), ("76", "fmt_v"),
        ("6B", "fmt_k"), ("62", "fmt_b")).toDF("magic", "fmt")
      val g = t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("magic", upper(substring(hex(col("payload")), 1, 2)))
        .join(broadcast(sig), Seq("magic"), "left")
        .withColumn("media_format", coalesce(col("fmt"), lit("unknown")))
        .groupBy(col("media_format"))
        .agg(count(lit(1)).as("n_payloads"),
          sum(octet_length(col("payload")).cast("long")).as("total_bytes"))
      g.withColumn("share",
          round(col("n_payloads").cast("double") /
            sum(col("n_payloads")).over(Window.partitionBy()), 6))
        .orderBy(col("media_format"))
    },

    // Per-partition throughput quantiles over the replay relation:
    // messages per second bucketed exactly, then nearest-rank p50/p95
    // via integer cross-compare (rn*100 >= n*q) — no interpolation, no
    // doubles. The windows run over (partition, second)-sized rows, not
    // messages; this is the sizing report for consumer parallelism.
    "k13_throughput_quantiles" -> { (s, dir) =>
      val sec = KafkaSource.replay(t(s, dir, "events"))
        .groupBy(col("partition"),
          date_trunc("second", col("timestamp")).as("s"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("partition"))
      val wo = w.orderBy(col("c"), col("s"))
      sec
        .withColumn("rn", row_number().over(wo))
        .withColumn("n", count(lit(1)).over(w))
        .groupBy(col("partition"))
        .agg(max(col("n")).as("n_seconds"),
          sum(col("c")).as("total_msgs"),
          min(when(col("rn") * 100 >= col("n") * 50, col("c")))
            .as("p50_per_sec"),
          min(when(col("rn") * 100 >= col("n") * 95, col("c")))
            .as("p95_per_sec"),
          max(col("c")).as("max_per_sec"))
        .orderBy(col("partition"))
    },

    // Cohort LTV curve: customers grouped by first-order month, revenue
    // tracked by integer cohort age (months since first order) with the
    // cumulative per-cohort running total — the standard lifetime-value
    // report. Age is exact integer year/month arithmetic (never
    // months_between's fractional double); windows run over
    // (cohort, age)-sized rows.
    "q93_cohort_ltv" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .withColumn("month", date_trunc("month", col("o_orderdate")))
        .withColumn("cohort",
          min(col("month")).over(Window.partitionBy(col("o_custkey"))))
        .withColumn("age",
          ((year(col("month")) - year(col("cohort"))) * 12 +
            (month(col("month")) - month(col("cohort")))).cast("int"))
      val g = o.groupBy(col("cohort"), col("age"))
        .agg(countDistinct(col("o_custkey")).as("n_active"),
          sum(col("o_totalprice").cast(dec2)).as("rev"))
      g.withColumn("cum_rev",
          sum(col("rev")).over(Window.partitionBy(col("cohort"))
            .orderBy(col("age"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("cohort"), col("age"), col("n_active"),
          col("rev").cast("double").as("revenue"),
          col("cum_rev").cast("double").as("cum_revenue"))
        .orderBy(col("cohort"), col("age"))
    },

    // Token-yield report: per source, document/token mass before vs
    // after the certified keep-one near-dedup — the number a mixture
    // planner actually budgets with (raw counts overstate a duplicated
    // source's contribution). Composes d09's survivor chain with exact
    // whitespace token counts; one doc-keyed join + source-sized agg.
    "t49_token_yield" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val pairs = Shared.pairs(s, dir).select(col("a"), col("b"))
      val surv = Dedup.dropNearDuplicates(d, pairs)
        .select(col("doc_id"), lit(1).as("kept"))
      val tok = d.select(col("doc_id"), col("source"),
        size(filter(split(col("text"), "\\s+"), x => x =!= ""))
          .cast("long").as("n_tok"))
      tok.join(surv, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          count(col("kept")).as("n_surviving_docs"),
          coalesce(sum(when(col("kept") === 1, col("n_tok"))), lit(0L))
            .as("n_surviving_tokens"))
        .withColumn("token_yield",
          floor(col("n_surviving_tokens").cast("double") * 1000000 /
            col("n_tokens") + 0.5).cast("long") / lit(1000000.0))
        .orderBy(col("source"))
    },

    // PQ distortion report: per subspace, the mean/max quantization
    // error of the certified s09 encoding — the index-quality budget
    // that tells you whether mSub/codebook size fit the corpus before
    // ADC recall degrades. Micro-unit integer mean over the round-6 d²;
    // one (m)-sized aggregation over the map-only encode.
    "s33_pq_distortion" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val enc = Similarity.pqEncode(e, Similarity.pqCodebook(e))
      enc
        .withColumn("dm", floor(col("d2") * 1000000 + 0.5).cast("long"))
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n_vectors"),
          (floor(sum(col("dm")).cast("double") / count(lit(1)) + 0.5)
            .cast("long") / lit(1000000.0)).as("mean_d2"),
          max(col("d2")).as("max_d2"),
          countDistinct(col("code")).as("n_codes_used"))
        .orderBy(col("m"))
    },

    // Quality-vs-duplication calibration: t03 quality deciles (exact
    // integer rank buckets, never ntile's engine-specific splits)
    // crossed with near-dup cluster membership — the diagnostic that
    // tells you whether the quality score and the dedup signal agree
    // before gating on either.
    "t54_quality_dup_calibration" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val q = TextAnalysis.withQuality(d)
        .select(col("doc_id"), col("quality_score"))
      val n = q.agg(count(lit(1)).as("n"))
      // Corpus-grain rank via the two-level block scan (doc_id breaks
      // quality-score ties, so ranks match the oracle's total order) —
      // a global Window.orderBy would rank every doc in one task.
      val ranked = Packing
        .globalRowNumber(q, Seq("quality_score", "doc_id"), "rk",
          numBlocks = 32)
        .crossJoin(broadcast(n))
        // floor, not a bare int cast: the engines disagree on
        // double→int rounding (truncate vs round-to-nearest)
        .withColumn("decile",
          floor(col("rk") * 10 / col("n")).cast("int"))
      val inCluster = Shared.pairs(s, dir)
        .select(explode(array(col("a"), col("b"))).as("doc_id"))
        .distinct().withColumn("dup", lit(1))
      ranked.join(inCluster, Seq("doc_id"), "left")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("dup")).as("n_duplicated"))
        .withColumn("dup_rate",
          floor(col("n_duplicated").cast("double") * 1000000 /
            col("n_docs") + 0.5).cast("long") / lit(1000000.0))
        .orderBy(col("decile"))
    },

    // TPC-H Q5 shape (local supplier volume): revenue from orders where
    // customer AND supplier sit in the same ASIA nation, one year —
    // the 6-table join benchmark classic. Dimensions broadcast; the two
    // fact tables shuffle once each on the join keys.
    "q99_local_supplier_volume" -> { (s, dir) =>
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .groupBy(col("n_name"))
        .agg(sum(drev(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q8 shape (market share): one nation's share of a region's
    // PROMO-part revenue per order year — the ratio-of-conditional-sums
    // pattern. Decimal sums; the share is the one closed double division
    // micro-floored.
    "q100_market_share" -> { (s, dir) =>
      val vol = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .withColumn("o_year", year(col("o_orderdate")).cast("int"))
        .withColumn("rev", drev(col("l_extendedprice"), col("l_discount")))
      vol.groupBy(col("o_year"))
        .agg(sum(col("rev")).as("total_rev"),
          coalesce(sum(when(col("n_name") === "NATION_13", col("rev"))),
            lit(0).cast(dec2)).as("nation_rev"))
        .select(col("o_year"),
          col("total_rev").cast("double").as("total_revenue"),
          col("nation_rev").cast("double").as("nation_revenue"),
          (floor(col("nation_rev").cast("double") * 1000000 /
            col("total_rev").cast("double") + 0.5).cast("long") /
            lit(1000000.0)).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // Pipeline attrition funnel: the d12 capstone chain re-run with
    // per-source stage counts — where does each source's mass die
    // (quality gate / exact dedup / near-dedup)? The report that
    // debugs a mixture before anyone trains on it.
    "d41_pipeline_funnel" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val kept = TextAnalysis.withRepetitionStats(d)
        .filter(col("keep"))
        .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      val red = TextAnalysis.withRedaction(kept)
        .select(col("doc_id"), col("source"), col("clean_text"),
          col("n_chars"))
      val ex = Dedup.dropExact(red, "doc_id", "clean_text")
      val pairs = Dedup.minhashPairs(ex, textCol = "clean_text")
        .select(col("a"), col("b"))
      val fin = Dedup.dropNearDuplicates(ex, pairs)
      def cnt(df: DataFrame, name: String): DataFrame =
        df.groupBy(col("source")).agg(count(lit(1)).as(name))
      cnt(d, "n_input")
        .join(cnt(kept, "n_after_gate"), Seq("source"), "left")
        .join(cnt(ex, "n_after_exact"), Seq("source"), "left")
        .join(cnt(fin, "n_after_near"), Seq("source"), "left")
        .select(col("source"), col("n_input"),
          coalesce(col("n_after_gate"), lit(0L)).as("n_after_gate"),
          coalesce(col("n_after_exact"), lit(0L)).as("n_after_exact"),
          coalesce(col("n_after_near"), lit(0L)).as("n_after_near"))
        .orderBy(col("source"))
    },

    // Recall-vs-nprobe tuning curve: the IVF search evaluated at nprobe
    // ∈ {1, 2, 4} against the same exact truth — the one table that
    // picks the operating point (each probe level multiplies scanned
    // cells; s35 prices the cost side). Exact integer hit sums.
    "s38_nprobe_sweep" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 100 === 0)
      val truth = Similarity.bruteForceTopK(e, q)
      val sweeps = Seq(1, 2, 4).map { np =>
        Similarity.annRecall(truth,
            Similarity.ivfSearch(e, q, nprobe = np))
          .agg(count(lit(1)).as("n_queries"),
            sum(col("n_hits")).as("n_hits"),
            sum(col("n_truth")).as("n_truth"))
          .withColumn("nprobe", lit(np))
      }
      sweeps.reduce(_ unionByName _)
        .select(col("nprobe"), col("n_queries"), col("n_hits"),
          col("n_truth"),
          (floor(col("n_hits").cast("double") * 1000000 /
            col("n_truth") + 0.5).cast("long") / lit(1000000.0))
            .as("recall"))
        .orderBy(col("nprobe"))
    },

    // At-least-once → exactly-once reconciliation: the replay relation
    // with every 10th offset delivered TWICE (the redelivery storm an
    // at-least-once source produces), deduplicated by (partition,
    // offset) keeping the first delivery — per partition: deliveries,
    // unique records, duplicates dropped. The ledger a checkpointed sink
    // maintains, expressed relationally.
    "k15_duplicate_delivery" -> { (s, dir) =>
      val r = KafkaSource.replay(t(s, dir, "events"))
        .withColumn("attempt", lit(1))
      val redelivered = r.filter(col("offset") % 10 === 0)
        .withColumn("attempt", lit(2))
      val all = r.unionByName(redelivered)
      val w = Window.partitionBy(col("partition"), col("offset"))
        .orderBy(col("attempt"))
      all.withColumn("rn", row_number().over(w))
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n_deliveries"),
          count(when(col("rn") === 1, 1)).as("n_unique"),
          count(when(col("rn") > 1, 1)).as("n_dupes_dropped"))
        .orderBy(col("partition"))
    },

    // Contrastive-pair builder: every (text, embedding)-paired id (m13's
    // integrity gates) gets its aligned positive plus ONE derangement
    // negative — the partner at hash-offset rank (offset ∈ [1, n-1], so
    // never itself). Zero RNG: the dataset regenerates identically on
    // both engines and every rerun. Windows run over the paired-id
    // dimension only.
    "m20_contrastive_pairs" -> { (s, dir) =>
      val p = t(s, dir, "documents")
        .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 11 =!= 0)
        .select(col("doc_id").as("id"))
      val n = p.agg(count(lit(1)).as("n"))
      // Panel rank via the two-level block scan — the global
      // Window.orderBy it replaces would rank the whole paired-id panel
      // in one task. The anchor side and the neg_rank self-join side
      // agree on ranks because ids are UNIQUE (a total order — ranks are
      // a pure function of the data); the checkpoint inside only pins
      // the block layout, it does not arbitrate ties.
      val ranked = Packing.globalRowNumber(p, Seq("id"), "rn",
          numBlocks = 32)
        .crossJoin(broadcast(n))
      val withNeg = ranked
        .withColumn("off", lit(1) +
          graft.functions.CrossHash.md5Long(
            concat(lit("n:"), col("id"))) % (col("n") - 1))
        .withColumn("neg_rank", (col("rn") + col("off")) % col("n"))
      withNeg
        .join(ranked.select(col("rn").as("neg_rank"),
          col("id").as("neg_id")), "neg_rank")
        .select(col("id").as("anchor_id"), col("id").as("pos_id"),
          col("neg_id"))
        .orderBy(col("anchor_id"))
    },

    // CUPED variance reduction (Deng et al. 2013): the experimentation
    // operator — per-user pre-period spend as the covariate, theta =
    // cov(pre, post)/var(pre) from exact decimal moments, and each
    // variant's adjusted mean post - theta·(pre - mean_pre). Variants
    // are hash-deterministic (user_id % 2). Every statistic is one
    // closed double formula over exact sums; outputs micro-floored.
    // User table is dimension-sized; events shuffle once on user_id.
    "q98_cuped" -> { (s, dir) =>
      val split = lit("2024-01-16").cast("timestamp_ntz")
      val per = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          coalesce(sum(when(col("ts") < split,
            col("value").cast(dec2))), lit(0).cast(dec2)).as("pre"),
          coalesce(sum(when(col("ts") >= split,
            col("value").cast(dec2))), lit(0).cast(dec2)).as("post"))
        .withColumn("variant", (col("user_id") % 2).cast("int"))
      val mom = per.agg(count(lit(1)).as("n"),
        sum(col("pre")).as("sx"), sum(col("post")).as("sy"),
        sum(col("pre") * col("pre")).as("sxx"),
        sum(col("pre") * col("post")).as("sxy"))
      val th = mom.select(col("n"),
        ((col("sxy").cast("double") - col("sx").cast("double") *
            col("sy").cast("double") / col("n")) /
          (col("sxx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / col("n"))).as("theta"),
        (col("sx").cast("double") / col("n")).as("mean_pre"))
      per.crossJoin(broadcast(th))
        // per-user adjusted value integerized to micro-units BEFORE the
        // variant sum — a raw double sum would be order-dependent
        .withColumn("adjm", floor((col("post").cast("double") -
          col("theta") * (col("pre").cast("double") - col("mean_pre"))) *
          1000000 + 0.5).cast("long"))
        .groupBy(col("variant"))
        .agg(count(lit(1)).as("n_users"),
          (floor(sum(col("post")).cast("double") * 1000000 /
            count(lit(1)) + 0.5).cast("long") / lit(1000000.0))
            .as("raw_mean"),
          (floor(sum(col("adjm")).cast("double") / count(lit(1)) + 0.5)
            .cast("long") / lit(1000000.0)).as("adjusted_mean"),
          (floor(max(col("theta")) * 1000000 + 0.5).cast("long") /
            lit(1000000.0)).as("theta"))
        .orderBy(col("variant"))
    },

    // Fill-in-the-middle: hash-deterministic PSM re-ordering, map-only,
    // rendered sequence md5-certified.
    "t53_fim_transform" -> { (s, dir) =>
      TextAnalysis.fimTransform(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    },

    // T5-style span corruption: deterministic hash-masked spans collapse
    // to <extra_id_k> sentinels; the corrupted sequence AND the target
    // sequence are certified by md5 of the exact rebuilt strings.
    "t52_span_corruption" -> { (s, dir) =>
      TextAnalysis.spanCorruption(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    },

    // Recall of the COMPRESSED search path: the certified IVF-PQ chain
    // (s11) scored against exact cosine truth, per label — quantifies
    // what the 8-byte codes + probe restriction cost in recall, the
    // number that justifies (or vetoes) deploying the compressed index.
    "s37_pq_recall" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 100 === 0)
      Similarity.annRecall(Similarity.bruteForceTopK(e, q),
          Similarity.ivfPqSearch(e, q))
        .join(e.select(col("vec_id").as("query_id"), col("label")),
          "query_id")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_queries"),
          sum(col("n_hits")).as("n_hits"),
          sum(col("n_truth")).as("n_truth"))
        .withColumn("recall",
          floor(col("n_hits").cast("double") * 1000000 /
            col("n_truth") + 0.5).cast("long") / lit(1000000.0))
        .orderBy(col("label"))
    },

    // Media QA capstone: the magic-byte dispatch (m16) crossed with the
    // corrupt-scan rules (m14) and the nibble-entropy profile (m15) —
    // per detected format: volume, corrupt rate, mean entropy. The
    // triage report a multimodal ingest publishes per batch; three
    // certified fragments, one composed oracle.
    "m19_media_qa" -> { (s, dir) =>
      import s.implicits._
      val sig = Seq(
        ("73", "fmt_s"), ("74", "fmt_t"), ("63", "fmt_c"),
        ("61", "fmt_a"), ("66", "fmt_f"), ("76", "fmt_v"),
        ("6B", "fmt_k"), ("62", "fmt_b")).toDF("magic", "fmt")
      val base = t(s, dir, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
      val flags = base
        .withColumn("magic", upper(substring(hex(col("payload")), 1, 2)))
        .join(broadcast(sig), Seq("magic"), "left")
        .withColumn("media_format", coalesce(col("fmt"), lit("unknown")))
        .withColumn("truncated", length(col("payload")) < 32)
        .withColumn("bad_magic",
          conv(substring(hex(col("payload")), 1, 2), 16, 10).cast("int")
            % 16 === 0)
        .select(col("doc_id"), col("media_format"), col("truncated"),
          col("bad_magic"))
      val ent = Multimodal.payloadNibbleEntropy(base)
        .select(col("doc_id"),
          floor(col("nibble_entropy") * 1000000 + 0.5).cast("long")
            .as("em"))
      flags.join(ent, "doc_id")
        .groupBy(col("media_format"))
        .agg(count(lit(1)).as("n_payloads"),
          count(when(col("truncated") || col("bad_magic"), 1))
            .as("n_corrupt"),
          (floor(count(when(col("truncated") || col("bad_magic"), 1))
            .cast("double") * 1000000 / count(lit(1)) + 0.5).cast("long")
            / lit(1000000.0)).as("corrupt_rate"),
          (floor(sum(col("em")).cast("double") / count(lit(1)) + 0.5)
            .cast("long") / lit(1000000.0)).as("mean_entropy"))
        .orderBy(col("media_format"))
    },

    // Community-quality audit: Newman modularity computed over the LPA
    // communities themselves (g03's labels × g09's formula) — does the
    // plurality partition actually concentrate edges, or did it shred a
    // real structure? Positive q_contrib per community = real cluster.
    "g17_community_modularity" -> { (s, dir) =>
      val e = Shared.pairs(s, dir)
        .select(col("a"), col("b"))
      val labels = Graph.labelPropagation(
          e.select(col("a").as("src"), col("b").as("dst")),
          iterations = 3)
        .select(col("id"), col("community"))
      val tot = e.agg(count(lit(1)).as("m"))
      val deg = e.select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        .join(labels, "id")
        .groupBy(col("community"))
        .agg(sum(col("deg")).as("d_sum"), count(lit(1)).as("n_nodes"))
      val within = e
        .join(labels.select(col("id").as("a"),
          col("community").as("ca")), "a")
        .join(labels.select(col("id").as("b"),
          col("community").as("cb")), "b")
        .filter(col("ca") === col("cb"))
        .groupBy(col("ca").as("community"))
        .agg(count(lit(1)).as("e_within"))
      val dd = col("d_sum").cast("double") / (col("m") * 2).cast("double")
      deg.join(within, Seq("community"), "left")
        .crossJoin(broadcast(tot))
        .select(col("community"), col("n_nodes"), col("d_sum"),
          coalesce(col("e_within"), lit(0L)).as("e_within"), col("m"),
          // + 0.0 folds IEEE -0.0 to +0.0: a zero-edge community's
          // -dd² rounds to negative zero in one engine and positive in
          // the other (surfaced by the sf0.1 strict check; invisible at
          // sf0.01). Same normalization on the oracle side.
          (round(coalesce(col("e_within"), lit(0L)).cast("double") /
            col("m") - dd * dd, 6) + lit(0.0)).as("q_contrib"))
        .orderBy(col("community"))
    },

    // RAG retrieval capstone: the corpus chunked into overlapping
    // passages (t22's exact integer windows), then BM25-ranked against
    // the query terms — retrieval at PASSAGE granularity, the context-
    // assembly shape a RAG pipeline runs. Passage ids are synthesized as
    // doc_id·1000 + passage_idx so provenance survives the ranking.
    // Composes two certified chains; one oracle certifies the whole.
    "t51_passage_retrieval" -> { (s, dir) =>
      val passages = TextAnalysis
        .passageChunks(t(s, dir, "documents"), window = 16, stride = 12)
        .select((col("doc_id") * 1000 + col("passage_idx")).as("doc_id"),
          col("passage").as("text"))
      TextAnalysis.bm25(passages,
          Seq("join", "vector", "spark", "customer"))
        .orderBy(col("rank"))
    },

    // Interval stitching: each event opens a 300-second activity
    // window; overlapping windows merge into maximal islands per user
    // (running-max boundary test — the linear gaps-and-islands
    // formulation, never an interval self-join). All arithmetic in
    // exact integer microseconds. Output per user: events, islands,
    // covered activity time.
    "q96_interval_merge" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("s_us"))
        .withColumn("e_us", col("s_us") + 300000000L)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("s_us"), col("event_id"))
      val marked = e
        .withColumn("prev_max", max(col("e_us")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("is_new",
          when(col("prev_max").isNull || col("s_us") > col("prev_max"), 1)
            .otherwise(0))
        .withColumn("island", sum(col("is_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      marked.groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("n_ev"), min(col("s_us")).as("i_s"),
          max(col("e_us")).as("i_e"))
        .groupBy(col("user_id"))
        .agg(sum(col("n_ev")).as("n_events"),
          count(lit(1)).as("n_islands"),
          sum(col("i_e") - col("i_s")).as("covered_us"))
        .orderBy(col("user_id"))
    },

    // First-touch vs last-touch attribution delta: the same conversions
    // credited under both rules (last = q85's as-of; first = the user's
    // earliest touch at-or-before the purchase), per channel — the
    // report that shows how much credit moves when the attribution rule
    // changes. One full-outer channel join of two certified chains.
    "q97_attribution_compare" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val dw = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val touch = ev
        .filter(col("event_type").isin("click", "view", "signup"))
        .withColumn("rn", row_number().over(dw)).filter(col("rn") === 1)
        .select(col("user_id").as("t_user"), col("ts").as("t_ts"),
          col("event_type").as("touch_type"))
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val lastCh = AsOfJoin.leftAsOf(conv, touch, "user_id", "ts",
          "t_user", "t_ts", Seq("touch_type"))
        .select(coalesce(col("touch_type"), lit("unattributed"))
          .as("channel"))
        .groupBy(col("channel")).agg(count(lit(1)).as("n_last_touch"))
      val ftw = Window.partitionBy(col("t_user"))
        .orderBy(col("t_ts"), col("touch_type"))
      val ft = touch.withColumn("fr", row_number().over(ftw))
        .filter(col("fr") === 1)
        .select(col("t_user"), col("t_ts").as("f_ts"),
          col("touch_type").as("f_type"))
      val firstCh = conv
        .join(ft, col("user_id") === col("t_user"), "left")
        .select(coalesce(when(col("f_ts") <= col("ts"), col("f_type")),
          lit("unattributed")).as("channel"))
        .groupBy(col("channel")).agg(count(lit(1)).as("n_first_touch"))
      lastCh.join(firstCh, Seq("channel"), "full_outer")
        .select(col("channel"),
          coalesce(col("n_first_touch"), lit(0L)).as("n_first_touch"),
          coalesce(col("n_last_touch"), lit(0L)).as("n_last_touch"))
        .withColumn("delta", col("n_first_touch") - col("n_last_touch"))
        .orderBy(col("channel"))
    },

    // Top-1 neighbor label confusion: for each query vector, the label
    // of its exact nearest neighbor vs its own — the (label × label)
    // coherence matrix that validates labels before kNN classification
    // or label-conditioned sampling trusts them. Reuses the s01
    // brute-force chain (broadcast query panel, WindowGroupLimit top-1).
    "s36_neighbor_confusion" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 20 === 0)
      Similarity.bruteForceTopK(e, q, k = 1)
        .join(e.select(col("vec_id").as("query_id"),
          col("label").as("query_label")), "query_id")
        .join(e.select(col("vec_id").as("neighbor_id"),
          col("label").as("neighbor_label")), "neighbor_id")
        .groupBy(col("query_label"), col("neighbor_label"))
        .agg(count(lit(1)).as("n_queries"))
        .orderBy(col("query_label"), col("neighbor_label"))
    },

    // ROLLUP with GROUPING indicators: the grouping_id/grouping()
    // bitmask semantics both engines must agree on for any BI cube
    // consumer — subtotal rows identified structurally, not by NULL
    // sentinels (which collide with genuine NULL keys).
    "q95_grouping_id" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""")
    },

    // Media balance matrix: media_type × source counts and byte mass
    // with per-source shares — the dataset-card slice for the media
    // columns (m01's certified meta, one dimension-sized aggregation).
    "m18_media_matrix" -> { (s, dir) =>
      val m = Multimodal.withMediaMeta(
        t(s, dir, "documents")
          .withColumn("payload", encode(col("text"), "UTF-8")))
      m.groupBy(col("source"), col("media_type"))
        .agg(count(lit(1)).as("n_payloads"),
          sum(col("n_bytes")).as("total_bytes"))
        .withColumn("share_of_source",
          floor(col("n_payloads").cast("double") * 1000000 /
            sum(col("n_payloads")).over(Window.partitionBy(col("source")))
            + 0.5).cast("long") / lit(1000000.0))
        .orderBy(col("source"), col("media_type"))
    },

    // Survivor-divergence report: per normalized-text dup group, compare
    // the priority winner (tier, doc_id — d29's rule) against the naive
    // min-id winner; per source, how many groups each rule awards and
    // the net document change. The dry-run audit you read BEFORE
    // switching dedup precedence rules on a 100 TB corpus. One nm
    // shuffle, two frames of the same window sort.
    "d40_survivor_divergence" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("nm",
          md5(TextAnalysis.normalizeForDedup(col("text"))))
        .withColumn("tier",
          (col("source").substr(lit(4), lit(10)).cast("int") % 3)
            .cast("int"))
      val wPr = Window.partitionBy(col("nm"))
        .orderBy(col("tier"), col("doc_id"))
      val wId = Window.partitionBy(col("nm")).orderBy(col("doc_id"))
      d.withColumn("rp", row_number().over(wPr))
        .withColumn("ri", row_number().over(wId))
        .groupBy(col("source"))
        .agg(count(when(col("rp") === 1, 1)).as("n_priority_wins"),
          count(when(col("ri") === 1, 1)).as("n_minid_wins"),
          count(when(col("rp") === 1 && col("ri") =!= 1, 1))
            .as("n_taken_over"))
        .withColumn("net_change",
          col("n_priority_wins") - col("n_minid_wins"))
        .orderBy(col("source"))
    },

    // IVF probe-cost report: per query, the exact number of corpus rows
    // its nprobe=2 cells force the search to score — the cost half of
    // the recall/cost tradeoff (s21/s34 report the recall half). Cell
    // sizes and probes both derive from the certified s02/s03 chains;
    // everything broadcasts except the one corpus-assignment pass.
    "s35_probe_cost" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 100 === 0)
      val cents = Similarity.sampleCentroids(e)
      val sizes = Similarity.ivfAssign(e, cents)
        .groupBy(col("cell")).agg(count(lit(1)).as("cell_size"))
      val nv = e.agg(count(lit(1)).as("nv"))
      val probes = q.select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("vq"))
        .crossJoin(broadcast(cents))
        .withColumn("d2", round(Similarity.dist2(col("vq"), col("cv")), 6))
        .withColumn("pr", row_number().over(Window
          .partitionBy(col("query_id"))
          .orderBy(col("d2"), col("centroid_id"))))
        .filter(col("pr") <= 2)
        .select(col("query_id"), col("centroid_id").as("cell"))
      probes.join(broadcast(sizes), "cell")
        .crossJoin(broadcast(nv))
        .groupBy(col("query_id"), col("nv"))
        .agg(count(lit(1)).as("n_cells"),
          sum(col("cell_size")).as("n_candidates"))
        .select(col("query_id"), col("n_cells"), col("n_candidates"),
          (floor(col("n_candidates").cast("double") * 1000000 /
            col("nv") + 0.5).cast("long") / lit(1000000.0))
            .as("pct_of_corpus"))
        .orderBy(col("query_id"))
    },

    // Weighted PageRank over the near-dup graph, edge weight = signature
    // agreement (n_eq): strong duplicates pull rank harder than
    // borderline band matches — the centrality that finds the canonical
    // template of a boilerplate family.
    "g16_weighted_pagerank" -> { (s, dir) =>
      val p = Shared.pairs(s, dir)
        .select(col("a"), col("b"), col("n_eq"))
      val edges = p.select(col("a").as("src"), col("b").as("dst"),
          col("n_eq").as("w"))
        .union(p.select(col("b").as("src"), col("a").as("dst"),
          col("n_eq").as("w")))
      Graph.weightedPageRank(edges).orderBy(col("id"))
    },

    // Doc-frequency spectrum of 3-word shingles (count-of-counts): how
    // many distinct shingles occur in exactly k documents — the
    // Good-Turing-style profile that tunes dedup thresholds (a fat k=2+
    // tail means boilerplate; a dominant k=1 mass means the corpus is
    // already diverse). One gram-hash shuffle + a spectrum-sized agg.
    "t50_gram_spectrum" -> { (s, dir) =>
      // The df-value histogram's support has no hard bound (it grows
      // sublinearly with the corpus), so the share denominator is a
      // broadcast 1-row aggregate, not a global window over it.
      val dfc = t(s, dir, "documents")
        .select(explode(Dedup.shingles(col("text"), 3)).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
      // localCheckpoint: the histogram is referenced twice (rows +
      // grand total) and is tiny; without the pin the shingle pipeline
      // would re-execute for the total whenever exchange reuse misses
      val spec = dfc.groupBy(col("df")).agg(count(lit(1)).as("n_grams"))
        .localCheckpoint(false)
      spec.crossJoin(broadcast(spec.agg(sum(col("n_grams")).as("__tot"))))
        .withColumn("share",
          floor(col("n_grams").cast("double") * 1000000 /
            col("__tot") + 0.5)
            .cast("long") / lit(1000000.0))
        .filter(col("df") <= 20)
        .select(col("df"), col("n_grams"), col("share"))
        .orderBy(col("df"))
    },

    // Recall sliced by label: the s21 truth/approx comparison aggregated
    // per query label — exposes WHICH slice an IVF index underserves
    // (a hot cell can hide a cold label's recall collapse behind a good
    // global mean). Exact integer hit/truth sums; micro-unit recall.
    "s34_recall_by_label" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") % 100 === 0)
      val rec = Similarity.annRecall(
        Similarity.bruteForceTopK(e, q), Similarity.ivfSearch(e, q))
      rec.join(e.select(col("vec_id").as("query_id"), col("label")),
          "query_id")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_queries"),
          sum(col("n_hits")).as("n_hits"),
          sum(col("n_truth")).as("n_truth"))
        .withColumn("recall",
          floor(col("n_hits").cast("double") * 1000000 /
            col("n_truth") + 0.5).cast("long") / lit(1000000.0))
        .orderBy(col("label"))
    },

    // Inter-purchase interval per market segment: consecutive-order gaps
    // in exact integer days (one custkey window), rolled up with
    // nearest-rank quantiles — the repeat-behavior profile behind
    // retention modeling. Customer dimension broadcast.
    "q94_purchase_interval" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .withColumn("prev", lag(col("o_orderdate"), 1).over(Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))))
        .filter(col("prev").isNotNull)
        .withColumn("gap", datediff(col("o_orderdate").cast("date"),
          col("prev").cast("date")).cast("long"))
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy(col("c_mktsegment"))
      val wo = w.orderBy(col("gap"), col("o_custkey"), col("o_orderkey"))
      o.withColumn("rn", row_number().over(wo))
        .withColumn("n", count(lit(1)).over(w))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_gaps"),
          (floor(sum(col("gap")).cast("double") * 1000000 /
            count(lit(1)) + 0.5).cast("long") / lit(1000000.0))
            .as("mean_days"),
          min(when(col("rn") * 100 >= col("n") * 50, col("gap")))
            .as("p50_days"),
          min(when(col("rn") * 100 >= col("n") * 90, col("gap")))
            .as("p90_days"),
          max(col("gap")).as("max_days"))
        .orderBy(col("c_mktsegment"))
    },

    // Supplier lead-time scorecard: order→ship latency in exact integer
    // days, nearest-rank p50/p95 (integer cross-compare, no
    // interpolation), order-free micro-unit mean, and a late rate —
    // the SLA report per dimension key. One orderkey join + supplier
    // windows over supplier-sized groups.
    "q91_lead_time" -> { (s, dir) =>
      val j = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"),
          col("l_shipdate"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("lat", datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")).cast("long"))
      val w = Window.partitionBy(col("l_suppkey"))
      val wo = w.orderBy(col("lat"), col("l_orderkey"), col("l_linenumber"))
      j.withColumn("rn", row_number().over(wo))
        .withColumn("n", count(lit(1)).over(w))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"),
          min(col("lat")).as("min_days"), max(col("lat")).as("max_days"),
          (floor(sum(col("lat")).cast("double") * 1000000 /
            count(lit(1)) + 0.5).cast("long") / lit(1000000.0))
            .as("mean_days"),
          min(when(col("rn") * 100 >= col("n") * 50, col("lat")))
            .as("p50_days"),
          min(when(col("rn") * 100 >= col("n") * 95, col("lat")))
            .as("p95_days"),
          (floor(count(when(col("lat") > 365, 1)).cast("double") *
            1000000 / count(lit(1)) + 0.5).cast("long") / lit(1000000.0))
            .as("late_rate"))
        .orderBy(col("l_suppkey"))
    },

    // Log-likelihood (G2) keyness: each source's most over-represented
    // terms vs the REST of the corpus — the domain-vocabulary profile
    // that catches a source drifting off-topic before it pollutes a
    // mixture. Exact integer counts feed one closed double formula over
    // round-6 logs (the t42 discipline), integerized to micro-units with
    // the portable floor(x+0.5) so the per-source ranking compares
    // integers, never raw doubles. One (source, term) shuffle + one
    // term-keyed join; source totals broadcast.
    "t47_keyness_g2" -> { (s, dir) =>
      val tok = t(s, dir, "documents")
        .select(col("source"),
          explode(split(lower(col("text")), "\\s+")).as("term"))
        .filter(col("term") =!= "")
      val st = tok.groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("a"))
      val termTot = st.groupBy(col("term")).agg(sum(col("a")).as("tt"))
      val srcTot = st.groupBy(col("source")).agg(sum(col("a")).as("stt"))
      val corpusTot = srcTot.agg(sum(col("stt")).as("ct"))
      st.join(termTot, "term")
        .join(broadcast(srcTot), "source")
        .crossJoin(broadcast(corpusTot))
        .withColumn("b", col("tt") - col("a"))
        .withColumn("e1",
          col("stt").cast("double") * col("tt") / col("ct"))
        .withColumn("e2",
          (col("ct") - col("stt")).cast("double") * col("tt") / col("ct"))
        .filter(col("a") >= 20 && col("b") >= 1)
        .withColumn("la", round(log(col("a") / col("e1")), 6))
        .withColumn("lb", round(log(col("b") / col("e2")), 6))
        .filter(col("la") > 0)
        .withColumn("g2m", floor((col("a") * col("la") +
          col("b") * col("lb")) * 2000000 + 0.5).cast("long"))
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("source"))
          .orderBy(col("g2m").desc, col("term"))))
        .filter(col("rn") <= 5)
        .select(col("source"), col("term"), col("a").as("n_in_source"),
          col("b").as("n_elsewhere"),
          (col("g2m") / lit(1000000.0)).as("g2"))
        .orderBy(col("source"), col("g2").desc, col("term"))
    },

    // Embedding-distribution drift: per label, the d² between the
    // centroids of the two corpus halves (vec_id parity — the stand-in
    // for "yesterday's snapshot vs today's"). Built on the certified
    // bounded-buffer chunked fold; the join is label-sized. The report
    // that tells you an embedding model or upstream filter changed
    // before the index quality degrades.
    "s31_centroid_shift" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      def half(rem: Int): DataFrame =
        Similarity.chunkedOrderedSum(
            emb.filter(col("vec_id") % 2 === rem)
              .select(col("label"), col("vec_id").as("id"),
                posexplode(col("embedding").cast("array<double>"))
                  .as(Seq("idx", "comp"))),
            Seq("label", "idx"), "id", "comp", 256)
          .groupBy(col("label"))
          .agg(transform(array_sort(collect_list(struct(col("idx"),
              (col("s") / col("cnt")).as("m")))),
            e2 => e2.getField("m")).as(s"cv$rem"))
      def n(rem: Int): DataFrame =
        emb.filter(col("vec_id") % 2 === rem).groupBy(col("label"))
          .agg(count(lit(1)).as(s"n$rem"))
      half(0).join(half(1), "label")
        .join(n(0), "label").join(n(1), "label")
        .select(col("label"), col("n0").as("n_even"),
          col("n1").as("n_odd"),
          round(Similarity.dist2(col("cv0"), col("cv1")), 6)
            .as("shift_d2"))
        .orderBy(col("label"))
    },

    // Degree assortativity of the near-dup graph (Newman's r): do
    // high-degree docs link high-degree docs? Positive r = template
    // families (hub pages duplicate each other); negative r = hub-and-
    // spoke boilerplate. Exact integer moments over the symmetrized
    // certified edge set; ONE closed double formula.
    "g14_assortativity" -> { (s, dir) =>
      val pairs = Shared.pairs(s, dir)
        .select(col("a"), col("b"))
      val edges = pairs.union(pairs.select(col("b").as("a"),
        col("a").as("b")))
      val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("d"))
      val j = edges
        .join(deg.select(col("a"), col("d").as("dx")), "a")
        .join(deg.select(col("a").as("b"), col("d").as("dy")), "b")
      j.agg(count(lit(1)).as("n"),
          sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
          sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dy") * col("dy")).as("syy"),
          sum(col("dx") * col("dy")).as("sxy"))
        .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
        .select(col("n_nodes"), (col("n") / 2).cast("long").as("n_edges"),
          round((col("n").cast("double") * col("sxy") -
              col("sx").cast("double") * col("sy")) /
            (sqrt(col("n").cast("double") * col("sxx") -
              col("sx").cast("double") * col("sx")) *
             sqrt(col("n").cast("double") * col("syy") -
              col("sy").cast("double") * col("sy"))), 6)
            .as("assortativity"))
    },

    // Perceptual-bucket frame dedup ratio: m03's frame signatures
    // truncated to one hex char (16 coarse buckets — the stand-in for a
    // perceptual hash, where near-identical frames collide), then per
    // payload: frames vs distinct buckets. The static-video / slideshow
    // detector. Map-only + one doc-keyed aggregation.
    "m17_frame_dup_ratio" -> { (s, dir) =>
      Multimodal.withFrameSamples(
          t(s, dir, "documents")
            .withColumn("payload", encode(col("text"), "UTF-8")))
        .withColumn("sig", substring(col("frame_md5"), 1, 1))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("sig")).as("n_distinct_sigs"))
        .withColumn("dup_ratio",
          floor((col("n_frames") - col("n_distinct_sigs")).cast("double") *
            1000000 / col("n_frames") + 0.5).cast("long") / lit(1000000.0))
        .orderBy(col("doc_id"))
    },

    // Cross-language near-dup matrix: certified minhash pairs labeled by
    // the two documents' languages (unordered) — translated/boilerplate
    // duplication across language slices, the contamination a per-lang
    // dedup run never sees. Two doc joins + one lang²-sized aggregation.
    "d38_cross_lang_dup" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val pairs = Shared.pairs(s, dir).select(col("a"), col("b"))
      val la = d.select(col("doc_id").as("a"), col("lang").as("lang_a0"))
      val lb = d.select(col("doc_id").as("b"), col("lang").as("lang_b0"))
      val m = pairs.join(la, "a").join(lb, "b")
        .select(least(col("lang_a0"), col("lang_b0")).as("lang_a"),
          greatest(col("lang_a0"), col("lang_b0")).as("lang_b"))
        .groupBy(col("lang_a"), col("lang_b"))
        .agg(count(lit(1)).as("n_pairs"))
      m.withColumn("share",
          floor(col("n_pairs").cast("double") * 1000000 /
            sum(col("n_pairs")).over(Window.partitionBy()) + 0.5)
            .cast("long") / lit(1000000.0))
        .orderBy(col("lang_a"), col("lang_b"))
    },

    // Partition balance report for the replay topic: each partition's
    // ratio to the ideal uniform share — the skew signal that sizes
    // consumer groups (s25's IVF balance shape, applied to Kafka).
    "k14_partition_skew" -> { (s, dir) =>
      KafkaSource.replay(t(s, dir, "events"))
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n_msgs"))
        .withColumn("total",
          sum(col("n_msgs")).over(Window.partitionBy()))
        .select(col("partition"), col("n_msgs"),
          (floor(col("n_msgs").cast("double") * 8000000 / col("total") +
            0.5).cast("long") / lit(1000000.0)).as("ratio_to_ideal"))
        .orderBy(col("partition"))
    },

    // Round-8 capstone: quality-seeded personalized PageRank over the
    // near-dup graph — seeds are the docs passing the certified t03
    // quality gate; restart-pinned mass ranks every connected doc by its
    // proximity to vetted content ("find more like the good ones", the
    // graph-walk curation primitive). Composes three certified chains
    // (minhash pairs, quality score, scaled-long PPR); one oracle
    // certifies the composition.
    "d39_ppr_curation" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val pairs = Shared.pairs(s, dir).select(col("a"), col("b"))
      val edges = pairs
        .select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      val seeds = TextAnalysis.withQuality(d)
        .filter(col("quality_score") > 0.55)
        .select(col("doc_id").as("id"))
      val ppr = Graph.personalizedPageRank(edges, seeds)
      ppr.join(seeds.withColumn("__s", lit(1)), Seq("id"), "left")
        .select(col("id").as("doc_id"),
          coalesce(col("__s"), lit(0)).as("is_seed"), col("ppr"))
        .orderBy(col("doc_id"))
    },

    // Hourly anomaly enrichment: per (event_type, hour-of-day), exact
    // decimal moments give mean/std (the q47 population formulas); each
    // event is then flagged against ITS bucket's 2σ band via a broadcast
    // join of the (type × 24)-sized stats back onto the stream. Two
    // passes over events, one shuffle each.
    "q92_hourly_zscore" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .withColumn("hour", hour(col("ts")).cast("int"))
        .withColumn("vd", col("value").cast(dec2))
      val stats = e.groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"), sum(col("vd")).as("s1"),
          sum(col("vd") * col("vd")).as("s2"))
        .withColumn("mean", col("s1").cast("double") / col("n"))
        .withColumn("sd", sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / col("n"))
          / col("n")))
      e.join(broadcast(stats), Seq("event_type", "hour"))
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n_events"),
          count(when(abs(col("vd").cast("double") - col("mean")) >
            col("sd") * 2, 1)).as("n_anomalies"),
          (floor(max(col("mean")) * 1000000 + 0.5).cast("long") /
            lit(1000000.0)).as("mean_value"),
          (floor(max(col("sd")) * 1000000 + 0.5).cast("long") /
            lit(1000000.0)).as("std_value"))
        .orderBy(col("event_type"), col("hour"))
    },

    // Word-complexity profile: syllables approximated as vowel runs —
    // counted EXACTLY via the replace-run-vs-delete length difference —
    // plus the share of 3+-syllable words (per-word run counts through a
    // nested array transform). Map-only; the readability-family quality
    // signal without trusting any engine tokenizer.
    "t48_word_complexity" -> { (s, dir) =>
      def runs(c: Column): Column =
        length(regexp_replace(c, "[aeiou]+", "V")) -
          length(regexp_replace(c, "[aeiou]+", ""))
      val d = t(s, dir, "documents")
        .withColumn("w", filter(split(lower(col("text")), "\\s+"),
          x => x =!= ""))
        .withColumn("n_words", size(col("w")).cast("long"))
        .withColumn("n_syllables", runs(lower(col("text"))).cast("long"))
        .withColumn("n_complex", size(filter(col("w"),
          x => length(regexp_replace(x, "[aeiou]+", "V")) -
            length(regexp_replace(x, "[aeiou]+", "")) >= 3)).cast("long"))
      d.select(col("doc_id"), col("n_words"), col("n_syllables"),
          col("n_complex"),
          (floor(col("n_syllables").cast("double") * 1000000 /
            col("n_words") + 0.5).cast("long") / lit(1000000.0))
            .as("syll_per_word"),
          (floor(col("n_complex").cast("double") * 1000000 /
            col("n_words") + 0.5).cast("long") / lit(1000000.0))
            .as("pct_complex"))
        .orderBy(col("doc_id"))
    },

    // Embedding norm histogram per label: ‖v‖ bucketed at 0.1 width via
    // the portable floor(x+0.5) — the normalization QA check (a cosine
    // index assumes unit-ish norms; a drifting tail breaks MIPS
    // reductions). Map-only + one (label, bucket) aggregation.
    "s32_norm_histogram" -> { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("norm2", round(Similarity.dot(col("v"), col("v")), 6))
        .withColumn("bucket",
          floor(sqrt(col("norm2")) * 10 + 0.5).cast("long"))
        .groupBy(col("label"), col("bucket"))
        .agg(count(lit(1)).as("n_vectors"))
        .orderBy(col("label"), col("bucket"))
    },

    // Core/periphery edge split: each near-dup edge classified by how
    // many endpoints survive the 3-core peel — the one-row summary of
    // whether duplication mass sits in dense template families (core)
    // or borderline chains (periphery).
    "g15_core_edge_split" -> { (s, dir) =>
      val pairs = Shared.pairs(s, dir)
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val core = Graph.kCore(
          pairs.select(col("a").as("src"), col("b").as("dst")), k = 3)
        .select(col("id"))
      val j = pairs
        .join(core.select(col("id").as("a"), lit(1).as("ca")), Seq("a"),
          "left")
        .join(core.select(col("id").as("b"), lit(1).as("cb")), Seq("b"),
          "left")
        .withColumn("n_in_core",
          coalesce(col("ca"), lit(0)) + coalesce(col("cb"), lit(0)))
      j.agg(count(lit(1)).as("n_edges"),
          count(when(col("n_in_core") === 2, 1)).as("n_core_core"),
          count(when(col("n_in_core") === 1, 1)).as("n_core_periph"),
          count(when(col("n_in_core") === 0, 1)).as("n_periph_periph"))
        .select(col("n_edges"), col("n_core_core"), col("n_core_periph"),
          col("n_periph_periph"),
          (floor(col("n_core_core").cast("double") * 1000000 /
            col("n_edges") + 0.5).cast("long") / lit(1000000.0))
            .as("core_share"))
    },

    // Cluster-density audit of the near-dup graph: per connected
    // component, direct edges vs implied pairs (n·(n-1)/2). A large
    // cluster with low density is the chain-collapse signature —
    // transitive closure glued docs that share no direct near-dup edge,
    // the #1 silent over-deletion risk of keep-one dedup. Composes the
    // certified pair + component chains; the audit itself is two
    // cluster-sized aggregations.
    "d37_cluster_density" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val pairs = Shared.pairs(s, dir).select(col("a"), col("b"))
      val cl = Dedup.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
      val members = cl.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      val edges = pairs
        .join(cl.select(col("doc_id").as("a"), col("cluster_id")), "a")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_edges"))
      members.join(edges, "cluster_id")
        .withColumn("n_implied",
          (col("n_members") * (col("n_members") - 1) / 2).cast("long"))
        .select(col("cluster_id"), col("n_members"), col("n_edges"),
          col("n_implied"),
          (col("n_implied") - col("n_edges")).as("n_missing_edges"),
          round((col("n_edges") * lit(2.0)) /
            (col("n_members") * (col("n_members") - 1)), 6).as("density"))
        .orderBy(col("n_members").desc, col("cluster_id"))
    })

  private val ppr = "CAST(floor(0.85 * CAST(coalesce(s, 0) AS DOUBLE)" +
    " + 0.5) AS BIGINT)"

  val oracles: Map[String, String] = Map(

    "q88_abc_pareto" -> """
      WITH pr AS (SELECT l_partkey,
          sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
        FROM lineitem GROUP BY 1),
      cw AS (SELECT l_partkey, rev,
          sum(rev) OVER (ORDER BY rev DESC, l_partkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          sum(rev) OVER () AS tot
        FROM pr),
      cls AS (SELECT *, CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                             WHEN cum * 100 <= tot * 95 THEN 'B'
                             ELSE 'C' END AS abc_class FROM cw)
      SELECT abc_class, count(*) AS n_parts,
        CAST(sum(rev) AS DOUBLE) AS class_revenue,
        round(CAST(sum(rev) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 6)
          AS revenue_share
      FROM cls GROUP BY 1 ORDER BY 1""",

    "q89_parent_share" -> """
      WITH rev AS (SELECT r_name, n_name,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2),
      w AS (SELECT *, sum(rev) OVER (PARTITION BY r_name) AS reg_tot,
          sum(rev) OVER () AS tot FROM rev)
      SELECT r_name, n_name, CAST(rev AS DOUBLE) AS nation_revenue,
        round(CAST(rev AS DOUBLE) / CAST(reg_tot AS DOUBLE), 6)
          AS share_of_region,
        round(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 6)
          AS share_of_total
      FROM w ORDER BY r_name, n_name""",

    "q90_new_returning" -> """
      WITH o AS (SELECT o_custkey, o_totalprice,
          CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
          CAST(min(date_trunc('month', o_orderdate))
            OVER (PARTITION BY o_custkey) AS TIMESTAMP) AS first_month
        FROM orders)
      SELECT month,
        count(DISTINCT o_custkey) FILTER (WHERE month = first_month)
          AS n_new_customers,
        count(DISTINCT o_custkey) FILTER (WHERE month != first_month)
          AS n_returning_customers,
        CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE month = first_month), 0) AS DOUBLE)
          AS new_revenue,
        CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE month != first_month), 0) AS DOUBLE)
          AS returning_revenue
      FROM o GROUP BY 1 ORDER BY 1""",

    // Mirrors the s05/s16 chunked centroid fold (vec_id // 256), then the
    // same a/b/sil closed formulas; the per-label mean folds the exact
    // micro-unit integers, so it is order-free on both engines.
    "s30_silhouette" -> """
      WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings),
      x AS (SELECT label, vec_id, t.i, v[t.i] AS comp
            FROM e, unnest(generate_series(1, len(v))) AS t(i)),
      p AS (SELECT label, i, vec_id // 256 AS chunk,
              list_reduce(list(comp ORDER BY vec_id), (a, b) -> a + b) AS ps,
              count(*) AS cnt
            FROM x GROUP BY label, i, chunk),
      m AS (SELECT label, i,
              list_reduce(list(ps ORDER BY chunk), (a, b) -> a + b)
                / CAST(sum(cnt) AS BIGINT) AS mean
            FROM p GROUP BY label, i),
      cv AS (SELECT label, list(mean ORDER BY i) AS cv FROM m
             GROUP BY label),
      sa AS (SELECT e.vec_id, e.label,
          round(list_reduce(list_transform(list_zip(e.v, cv.cv),
            q -> (q[1] - q[2]) * (q[1] - q[2])), (a, b) -> a + b), 6) AS a
        FROM e JOIN cv ON cv.label = e.label),
      sb AS (SELECT e.vec_id, e.label,
          min(round(list_reduce(list_transform(list_zip(e.v, c2.cv),
            q -> (q[1] - q[2]) * (q[1] - q[2])), (a, b) -> a + b), 6)) AS b
        FROM e JOIN cv c2 ON c2.label != e.label GROUP BY 1, 2),
      sm AS (SELECT sa.label,
          CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
               ELSE CAST(floor((b - a) / greatest(a, b) * 1000000 + 0.5)
                 AS BIGINT) END AS sm
        FROM sa JOIN sb ON sa.vec_id = sb.vec_id AND sa.label = sb.label)
      SELECT label, count(*) AS n_vectors,
        CAST(floor(CAST(sum(sm) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
          / 1000000.0 AS mean_sil
      FROM sm GROUP BY label ORDER BY label""",

    "g13_seed_pagerank" -> s"""
      WITH cs AS (SELECT o_custkey AS cust, l_suppkey + 1000000 AS supp
                  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      e AS (SELECT DISTINCT src, dst FROM (
          SELECT cust AS src, supp AS dst FROM cs
          UNION ALL SELECT supp AS src, cust AS dst FROM cs)),
      nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
      od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
      p0 AS (SELECT id, CAST(CASE WHEN id % 13 = 0
          THEN 10000000000 ELSE 0 END AS BIGINT) AS prl FROM nodes),
      c1 AS (SELECT e.dst, CAST(floor(CAST(p.prl AS DOUBLE) / od.outdeg
          + 0.5) AS BIGINT) AS c
        FROM e JOIN p0 p ON p.id = e.src JOIN od ON od.src = e.src),
      i1 AS (SELECT dst, CAST(sum(c) AS BIGINT) AS s FROM c1 GROUP BY dst),
      p1 AS (SELECT id, CAST(CASE WHEN id % 13 = 0
          THEN 1500000000 ELSE 0 END AS BIGINT) + $ppr AS prl
        FROM nodes LEFT JOIN i1 ON i1.dst = nodes.id),
      c2 AS (SELECT e.dst, CAST(floor(CAST(p.prl AS DOUBLE) / od.outdeg
          + 0.5) AS BIGINT) AS c
        FROM e JOIN p1 p ON p.id = e.src JOIN od ON od.src = e.src),
      i2 AS (SELECT dst, CAST(sum(c) AS BIGINT) AS s FROM c2 GROUP BY dst),
      p2 AS (SELECT id, CAST(CASE WHEN id % 13 = 0
          THEN 1500000000 ELSE 0 END AS BIGINT) + $ppr AS prl
        FROM nodes LEFT JOIN i2 ON i2.dst = nodes.id),
      c3 AS (SELECT e.dst, CAST(floor(CAST(p.prl AS DOUBLE) / od.outdeg
          + 0.5) AS BIGINT) AS c
        FROM e JOIN p2 p ON p.id = e.src JOIN od ON od.src = e.src),
      i3 AS (SELECT dst, CAST(sum(c) AS BIGINT) AS s FROM c3 GROUP BY dst),
      p3 AS (SELECT id, CAST(CASE WHEN id % 13 = 0
          THEN 1500000000 ELSE 0 END AS BIGINT) + $ppr AS prl
        FROM nodes LEFT JOIN i3 ON i3.dst = nodes.id)
      SELECT id, CAST(prl AS DOUBLE) / 10000000000.0 AS ppr
      FROM p3 ORDER BY id""",

    "t46_charclass_profile" -> """
      WITH d AS (SELECT source, CAST(length(text) AS BIGINT) AS n_all,
          CAST(length(text) -
            length(regexp_replace(text, '[a-z]', '', 'g')) AS BIGINT)
            AS n_lower,
          CAST(length(text) -
            length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT)
            AS n_upper,
          CAST(length(text) -
            length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
            AS n_digit,
          CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
            AS n_space
        FROM documents),
      g AS (SELECT source, count(*) AS n_docs,
          CAST(sum(n_all) AS BIGINT) AS total_chars,
          CAST(sum(n_lower) AS BIGINT) AS sl,
          CAST(sum(n_upper) AS BIGINT) AS su,
          CAST(sum(n_digit) AS BIGINT) AS sd,
          CAST(sum(n_space) AS BIGINT) AS ss
        FROM d GROUP BY 1)
      SELECT source, n_docs, total_chars,
        round(CAST(sl AS DOUBLE) / total_chars, 6) AS lower_ratio,
        round(CAST(su AS DOUBLE) / total_chars, 6) AS upper_ratio,
        round(CAST(sd AS DOUBLE) / total_chars, 6) AS digit_ratio,
        round(CAST(ss AS DOUBLE) / total_chars, 6) AS space_ratio,
        round(CAST(total_chars - sl - su - sd - ss AS DOUBLE)
          / total_chars, 6) AS other_ratio
      FROM g ORDER BY source""",

    "m16_magic_sniff" -> """
      WITH sig(magic, fmt) AS (VALUES
        ('73', 'fmt_s'), ('74', 'fmt_t'), ('63', 'fmt_c'),
        ('61', 'fmt_a'), ('66', 'fmt_f'), ('76', 'fmt_v'),
        ('6B', 'fmt_k'), ('62', 'fmt_b')),
      p AS (SELECT encode(text) AS payload FROM documents),
      c AS (SELECT coalesce(fmt, 'unknown') AS media_format,
          octet_length(payload) AS nb
        FROM p LEFT JOIN sig
          ON upper(substr(hex(payload), 1, 2)) = sig.magic),
      g AS (SELECT media_format, count(*) AS n_payloads,
          CAST(sum(nb) AS BIGINT) AS total_bytes
        FROM c GROUP BY 1)
      SELECT media_format, n_payloads, total_bytes,
        round(CAST(n_payloads AS DOUBLE) /
          CAST(sum(n_payloads) OVER () AS BIGINT), 6) AS share
      FROM g ORDER BY media_format""",

    "k13_throughput_quantiles" -> s"""
      WITH r AS (${KafkaParity.replaySql}),
      sec AS (SELECT "partition", date_trunc('second', "timestamp") AS s,
          count(*) AS c FROM r GROUP BY 1, 2),
      w AS (SELECT *, row_number() OVER (PARTITION BY "partition"
            ORDER BY c, s) AS rn,
          count(*) OVER (PARTITION BY "partition") AS n FROM sec)
      SELECT "partition", max(n) AS n_seconds,
        CAST(sum(c) AS BIGINT) AS total_msgs,
        min(c) FILTER (WHERE rn * 100 >= n * 50) AS p50_per_sec,
        min(c) FILTER (WHERE rn * 100 >= n * 95) AS p95_per_sec,
        max(c) AS max_per_sec
      FROM w GROUP BY 1 ORDER BY 1""",

    // Quality chain (d19's qb/qm/qs), seed gate, then the unrolled
    // 3-iteration scaled-long PPR over the symmetrized pair graph.
    "d39_ppr_curation" -> s"""
      WITH ${NorthStar.MinhashCtes},
      filt AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      qb AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w
             FROM documents),
      qm AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
          CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w) AS stop_ratio,
          CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w) AS avg_token_len
        FROM qb),
      qs AS (SELECT doc_id,
          0.5 * (CAST(least(n_tokens, 200) AS DOUBLE) / 200.0)
            + 0.3 * (1.0 - stop_ratio)
            + 0.2 * least(avg_token_len / 10.0, 1.0) AS quality_score
        FROM qm),
      sd AS (SELECT doc_id FROM qs WHERE quality_score > 0.55),
      ed AS (SELECT a AS src, b AS dst FROM filt
             UNION ALL SELECT b, a FROM filt),
      nodes AS (SELECT src AS id FROM ed UNION SELECT dst FROM ed),
      ns AS (SELECT nodes.id, CASE WHEN sd.doc_id IS NOT NULL
          THEN 1 ELSE 0 END AS is_seed
        FROM nodes LEFT JOIN sd ON sd.doc_id = nodes.id),
      od AS (SELECT src, count(*) AS outdeg FROM ed GROUP BY src),
      p0 AS (SELECT id, CAST(CASE WHEN is_seed = 1
          THEN 10000000000 ELSE 0 END AS BIGINT) AS prl FROM ns),
      c1 AS (SELECT ed.dst, CAST(floor(CAST(p.prl AS DOUBLE) / od.outdeg
          + 0.5) AS BIGINT) AS c
        FROM ed JOIN p0 p ON p.id = ed.src JOIN od ON od.src = ed.src),
      i1 AS (SELECT dst, CAST(sum(c) AS BIGINT) AS s FROM c1 GROUP BY dst),
      p1 AS (SELECT ns.id, CAST(CASE WHEN is_seed = 1
          THEN 1500000000 ELSE 0 END AS BIGINT) + $ppr AS prl
        FROM ns LEFT JOIN i1 ON i1.dst = ns.id),
      c2 AS (SELECT ed.dst, CAST(floor(CAST(p.prl AS DOUBLE) / od.outdeg
          + 0.5) AS BIGINT) AS c
        FROM ed JOIN p1 p ON p.id = ed.src JOIN od ON od.src = ed.src),
      i2 AS (SELECT dst, CAST(sum(c) AS BIGINT) AS s FROM c2 GROUP BY dst),
      p2 AS (SELECT ns.id, CAST(CASE WHEN is_seed = 1
          THEN 1500000000 ELSE 0 END AS BIGINT) + $ppr AS prl
        FROM ns LEFT JOIN i2 ON i2.dst = ns.id),
      c3 AS (SELECT ed.dst, CAST(floor(CAST(p.prl AS DOUBLE) / od.outdeg
          + 0.5) AS BIGINT) AS c
        FROM ed JOIN p2 p ON p.id = ed.src JOIN od ON od.src = ed.src),
      i3 AS (SELECT dst, CAST(sum(c) AS BIGINT) AS s FROM c3 GROUP BY dst),
      p3 AS (SELECT ns.id, CAST(CASE WHEN is_seed = 1
          THEN 1500000000 ELSE 0 END AS BIGINT) + $ppr AS prl
        FROM ns LEFT JOIN i3 ON i3.dst = ns.id)
      SELECT ns.id AS doc_id, ns.is_seed,
        CAST(prl AS DOUBLE) / 10000000000.0 AS ppr
      FROM p3 JOIN ns ON ns.id = p3.id ORDER BY doc_id""",

    "q92_hourly_zscore" -> """
      WITH e AS (SELECT event_type, CAST(hour(ts) AS INT) AS hour,
          CAST(value AS DECIMAL(18,2)) AS vd FROM events),
      st AS (SELECT event_type, hour, count(*) AS n, sum(vd) AS s1,
          sum(vd * vd) AS s2 FROM e GROUP BY 1, 2),
      sm AS (SELECT *, CAST(s1 AS DOUBLE) / n AS mean,
          sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
            * CAST(s1 AS DOUBLE) / n) / n) AS sd FROM st)
      SELECT e.event_type, e.hour, count(*) AS n_events,
        count(*) FILTER (WHERE abs(CAST(vd AS DOUBLE) - mean) > sd * 2)
          AS n_anomalies,
        CAST(floor(max(mean) * 1000000 + 0.5) AS BIGINT) / 1000000.0
          AS mean_value,
        CAST(floor(max(sd) * 1000000 + 0.5) AS BIGINT) / 1000000.0
          AS std_value
      FROM e JOIN sm ON sm.event_type = e.event_type AND sm.hour = e.hour
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "t48_word_complexity" -> raw"""
      WITH d AS (SELECT doc_id,
          list_filter(string_split_regex(lower(text), '\s+'),
            x -> x != '') AS w,
          length(regexp_replace(lower(text), '[aeiou]+', 'V', 'g')) -
            length(regexp_replace(lower(text), '[aeiou]+', '', 'g'))
            AS n_syll
        FROM documents),
      c AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
          CAST(n_syll AS BIGINT) AS n_syllables,
          CAST(len(list_filter(w, x ->
            length(regexp_replace(x, '[aeiou]+', 'V', 'g')) -
            length(regexp_replace(x, '[aeiou]+', '', 'g')) >= 3))
            AS BIGINT) AS n_complex
        FROM d)
      SELECT doc_id, n_words, n_syllables, n_complex,
        CAST(floor(CAST(n_syllables AS DOUBLE) * 1000000 / n_words + 0.5)
          AS BIGINT) / 1000000.0 AS syll_per_word,
        CAST(floor(CAST(n_complex AS DOUBLE) * 1000000 / n_words + 0.5)
          AS BIGINT) / 1000000.0 AS pct_complex
      FROM c ORDER BY doc_id""",

    "s32_norm_histogram" -> """
      WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (SELECT label, round(list_dot_product(v, v), 6) AS norm2
            FROM e)
      SELECT label, CAST(floor(sqrt(norm2) * 10 + 0.5) AS BIGINT)
          AS bucket, count(*) AS n_vectors
      FROM n GROUP BY 1, 2 ORDER BY 1, 2""",

    // g05's peel chain; the core set is its output membership (kdf).
    "g15_core_edge_split" -> s"""
      WITH ${NorthStar.MinhashCtes},
      kc_filt AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      kc_ec AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
                FROM kc_filt WHERE a <> b),
      kc_adj AS (SELECT a AS z, b AS x FROM kc_ec
                 UNION ALL SELECT b AS z, a AS x FROM kc_ec),
      kd1 AS (SELECT z, count(*) AS deg FROM kc_adj GROUP BY z),
      ka1 AS (SELECT z AS id FROM kd1 WHERE deg >= 3),
      kd2 AS (SELECT e.z, count(*) AS deg FROM kc_adj e
              JOIN ka1 p ON p.id = e.z JOIN ka1 q ON q.id = e.x
              GROUP BY e.z),
      ka2 AS (SELECT z AS id FROM kd2 WHERE deg >= 3),
      kd3 AS (SELECT e.z, count(*) AS deg FROM kc_adj e
              JOIN ka2 p ON p.id = e.z JOIN ka2 q ON q.id = e.x
              GROUP BY e.z),
      ka3 AS (SELECT z AS id FROM kd3 WHERE deg >= 3),
      kdf AS (SELECT e.z, count(*) AS deg FROM kc_adj e
              JOIN ka3 p ON p.id = e.z JOIN ka3 q ON q.id = e.x
              GROUP BY e.z),
      core AS (SELECT z AS id FROM kdf),
      j AS (SELECT kc_ec.a, kc_ec.b,
          (CASE WHEN ca.id IS NOT NULL THEN 1 ELSE 0 END +
           CASE WHEN cb.id IS NOT NULL THEN 1 ELSE 0 END) AS nic
        FROM kc_ec LEFT JOIN core ca ON ca.id = kc_ec.a
                   LEFT JOIN core cb ON cb.id = kc_ec.b)
      SELECT count(*) AS n_edges,
        count(*) FILTER (WHERE nic = 2) AS n_core_core,
        count(*) FILTER (WHERE nic = 1) AS n_core_periph,
        count(*) FILTER (WHERE nic = 0) AS n_periph_periph,
        CAST(floor(CAST(count(*) FILTER (WHERE nic = 2) AS DOUBLE)
          * 1000000 / count(*) + 0.5) AS BIGINT) / 1000000.0
          AS core_share
      FROM j""",

    "q93_cohort_ltv" -> """
      WITH o AS (SELECT o_custkey, o_totalprice,
          CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
          CAST(min(date_trunc('month', o_orderdate))
            OVER (PARTITION BY o_custkey) AS TIMESTAMP) AS cohort
        FROM orders),
      a AS (SELECT *, CAST((year(month) - year(cohort)) * 12 +
          (month(month) - month(cohort)) AS INT) AS age FROM o),
      g AS (SELECT cohort, age, count(DISTINCT o_custkey) AS n_active,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM a GROUP BY 1, 2)
      SELECT cohort, age, n_active, CAST(rev AS DOUBLE) AS revenue,
        CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS cum_revenue
      FROM g ORDER BY cohort, age""",

    // d08's component chain → keep-one survivors → per-source token mass.
    "t49_token_yield" -> s"""
      WITH RECURSIVE ${NorthStar.MinhashCtes},
      filt AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      edges(src, dst) AS (
        SELECT a, b FROM filt UNION SELECT b, a FROM filt),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
             FROM reach GROUP BY src),
      dropped AS (SELECT doc_id FROM cl WHERE doc_id != cluster_id),
      tok AS (SELECT doc_id, source,
          CAST(len(list_filter(string_split_regex(text, '\\s+'),
            x -> x != '')) AS BIGINT) AS n_tok
        FROM documents),
      tk AS (SELECT tok.*, CASE WHEN dropped.doc_id IS NULL THEN 1 END
          AS kept
        FROM tok LEFT JOIN dropped ON dropped.doc_id = tok.doc_id),
      g AS (SELECT source, count(*) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS n_tokens,
          count(kept) AS n_surviving_docs,
          CAST(coalesce(sum(n_tok) FILTER (WHERE kept = 1), 0) AS BIGINT)
            AS n_surviving_tokens
        FROM tk GROUP BY 1)
      SELECT *, CAST(floor(CAST(n_surviving_tokens AS DOUBLE) * 1000000
          / n_tokens + 0.5) AS BIGINT) / 1000000.0 AS token_yield
      FROM g ORDER BY source""",

    "s33_pq_distortion" -> (NorthStar.PqCodesCte + """
      SELECT CAST(m AS INT) AS m, count(*) AS n_vectors,
        CAST(floor(CAST(sum(CAST(floor(d2 * 1000000 + 0.5) AS BIGINT))
          AS DOUBLE) / count(*) + 0.5) AS BIGINT) / 1000000.0 AS mean_d2,
        max(d2) AS max_d2,
        count(DISTINCT code) AS n_codes_used
      FROM codes GROUP BY m ORDER BY m"""),

    // d19's quality chain, integer decile buckets, pair-membership join.
    "t54_quality_dup_calibration" -> s"""
      WITH ${NorthStar.MinhashCtes},
      filt AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      qb AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w
             FROM documents),
      qm AS (SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
          CAST(len(list_filter(w, t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w) AS stop_ratio,
          CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w) AS avg_token_len
        FROM qb),
      qs AS (SELECT doc_id,
          0.5 * (CAST(least(n_tokens, 200) AS DOUBLE) / 200.0)
            + 0.3 * (1.0 - stop_ratio)
            + 0.2 * least(avg_token_len / 10.0, 1.0) AS quality_score
        FROM qm),
      nn AS (SELECT count(*) AS n FROM qs),
      rkd AS (SELECT doc_id, CAST(floor((row_number() OVER (
            ORDER BY quality_score, doc_id) - 1) * 10 / n) AS INT)
          AS decile
        FROM qs, nn),
      dup AS (SELECT DISTINCT doc_id FROM (
          SELECT a AS doc_id FROM filt UNION ALL SELECT b FROM filt))
      SELECT decile, count(*) AS n_docs,
        count(dup.doc_id) AS n_duplicated,
        CAST(floor(CAST(count(dup.doc_id) AS DOUBLE) * 1000000 /
          count(*) + 0.5) AS BIGINT) / 1000000.0 AS dup_rate
      FROM rkd LEFT JOIN dup ON dup.doc_id = rkd.doc_id
      GROUP BY 1 ORDER BY 1""",

    "q99_local_supplier_volume" -> """
      SELECT n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
                   AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",

    "q100_market_share" -> """
      WITH vol AS (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
          n_name,
          CAST(l_extendedprice AS DECIMAL(18,2)) *
            (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      g AS (SELECT o_year, sum(rev) AS total_rev,
          coalesce(sum(rev) FILTER (WHERE n_name = 'NATION_13'), 0)
            AS nation_rev
        FROM vol GROUP BY 1)
      SELECT o_year, CAST(total_rev AS DOUBLE) AS total_revenue,
        CAST(nation_rev AS DOUBLE) AS nation_revenue,
        CAST(floor(CAST(nation_rev AS DOUBLE) * 1000000 /
          CAST(total_rev AS DOUBLE) + 0.5) AS BIGINT) / 1000000.0
          AS mkt_share
      FROM g ORDER BY o_year""",

    // d12's stage CTEs with `source` carried through, counted per stage.
    "d41_pipeline_funnel" -> (raw"""
      WITH RECURSIVE
      w0 AS (SELECT doc_id, source, text, n_chars,
          string_split_regex(lower(text), '\s+') AS w FROM documents),
      gate AS (SELECT doc_id, source, text, n_chars FROM w0
        WHERE len(w) BETWEEN 5 AND 10000
          AND CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / len(w) <= 0.3
          AND CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
              / len(w) >= 0.8),
      red AS (SELECT doc_id, source, n_chars,
          regexp_replace(regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
            '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g') AS text
        FROM gate),
      ex AS (SELECT doc_id, source, n_chars, text FROM (
          SELECT doc_id, source, n_chars, text, row_number()
            OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM red)
        WHERE rn = 1),
      """ + s"""${NorthStar.minhashCtes("ex")},
      filt AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      edges(src, dst) AS (SELECT a, b FROM filt UNION SELECT b, a FROM filt),
      reach(src, dst) AS (SELECT src, dst FROM edges
        UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      clusters AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        FROM reach GROUP BY src),
      dropped AS (SELECT doc_id FROM clusters WHERE doc_id != cluster_id),
      fin AS (SELECT * FROM ex
        WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
      i0 AS (SELECT source, count(*) AS n_input FROM documents GROUP BY 1),
      g1 AS (SELECT source, count(*) AS n_after_gate FROM gate GROUP BY 1),
      e1 AS (SELECT source, count(*) AS n_after_exact FROM ex GROUP BY 1),
      f1 AS (SELECT source, count(*) AS n_after_near FROM fin GROUP BY 1)
      SELECT i0.source, n_input,
        coalesce(n_after_gate, 0) AS n_after_gate,
        coalesce(n_after_exact, 0) AS n_after_exact,
        coalesce(n_after_near, 0) AS n_after_near
      FROM i0 LEFT JOIN g1 USING (source) LEFT JOIN e1 USING (source)
        LEFT JOIN f1 USING (source)
      ORDER BY i0.source"""),

    "s38_nprobe_sweep" -> s"""
      WITH ${NorthStar.AnnEvalCtes},
      qpr AS (SELECT query_id, centroid_id AS cell, row_number() OVER (
          PARTITION BY query_id ORDER BY d2, centroid_id) AS pr FROM qs),
      lv AS (SELECT * FROM (VALUES (1), (2), (4)) AS t(np)),
      icx AS (SELECT lv.np, qpr.query_id, cn.vec_id AS neighbor_id,
          round(list_dot_product(qn.v, cn.v) / (qn.nrm * cn.nrm), 6)
            AS cosine
        FROM lv JOIN qpr ON qpr.pr <= lv.np
             JOIN a ON a.cell = qpr.cell
             JOIN n cn ON cn.vec_id = a.vec_id
             JOIN n qn ON qn.vec_id = qpr.query_id
        WHERE cn.vec_id != qpr.query_id),
      apx AS (SELECT np, query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY np, query_id
            ORDER BY cosine DESC, neighbor_id) AS rk FROM icx)
        WHERE rk <= 5),
      fin AS (SELECT lv.np, t.query_id, count(*) AS n_truth,
          count(ap.neighbor_id) AS n_hits
        FROM lv CROSS JOIN truth t LEFT JOIN apx ap
          ON ap.np = lv.np AND ap.query_id = t.query_id
          AND ap.neighbor_id = t.neighbor_id
        GROUP BY 1, 2)
      SELECT np AS nprobe, count(*) AS n_queries,
        CAST(sum(n_hits) AS BIGINT) AS n_hits,
        CAST(sum(n_truth) AS BIGINT) AS n_truth,
        CAST(floor(CAST(sum(n_hits) AS DOUBLE) * 1000000 /
          CAST(sum(n_truth) AS BIGINT) + 0.5) AS BIGINT) / 1000000.0
          AS recall
      FROM fin GROUP BY 1 ORDER BY 1""",

    "k15_duplicate_delivery" -> s"""
      WITH r AS (SELECT *, 1 AS attempt FROM (${KafkaParity.replaySql})),
      all_d AS (SELECT * FROM r
        UNION ALL SELECT "topic", "partition", "offset", "timestamp",
          "key", "value", "error", 2 AS attempt
        FROM r WHERE "offset" % 10 = 0),
      w AS (SELECT *, row_number() OVER (PARTITION BY "partition",
          "offset" ORDER BY attempt) AS rn FROM all_d)
      SELECT "partition", count(*) AS n_deliveries,
        count(*) FILTER (WHERE rn = 1) AS n_unique,
        count(*) FILTER (WHERE rn > 1) AS n_dupes_dropped
      FROM w GROUP BY 1 ORDER BY 1""",

    "m20_contrastive_pairs" -> """
      WITH p AS (SELECT doc_id AS id FROM documents
        WHERE doc_id % 7 != 0 AND doc_id % 11 != 0),
      nn AS (SELECT count(*) AS n FROM p),
      r AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS rn, n
            FROM p, nn),
      w AS (SELECT *, (rn + 1 +
          ('0x' || substr(md5('n:' || id), 1, 15))::BIGINT % (n - 1)) % n
            AS neg_rank FROM r)
      SELECT w.id AS anchor_id, w.id AS pos_id, r2.id AS neg_id
      FROM w JOIN r r2 ON r2.rn = w.neg_rank
      ORDER BY anchor_id""",

    "q98_cuped" -> """
      WITH per AS (SELECT user_id,
          coalesce(sum(CAST(value AS DECIMAL(18,2)))
            FILTER (WHERE ts < TIMESTAMP '2024-01-16'), 0) AS pre,
          coalesce(sum(CAST(value AS DECIMAL(18,2)))
            FILTER (WHERE ts >= TIMESTAMP '2024-01-16'), 0) AS post,
          CAST(user_id % 2 AS INT) AS variant
        FROM events GROUP BY 1),
      mom AS (SELECT count(*) AS n,
          sum(pre) AS sx, sum(post) AS sy,
          sum(pre * pre) AS sxx, sum(pre * post) AS sxy FROM per),
      th AS (SELECT n,
          (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
            * CAST(sy AS DOUBLE) / n) /
          (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
            * CAST(sx AS DOUBLE) / n) AS theta,
          CAST(sx AS DOUBLE) / n AS mean_pre FROM mom),
      adj AS (SELECT variant, post,
          CAST(floor((CAST(post AS DOUBLE) - theta *
            (CAST(pre AS DOUBLE) - mean_pre)) * 1000000 + 0.5) AS BIGINT)
            AS adjm,
          theta
        FROM per, th)
      SELECT variant, count(*) AS n_users,
        CAST(floor(CAST(sum(post) AS DOUBLE) * 1000000 / count(*) + 0.5)
          AS BIGINT) / 1000000.0 AS raw_mean,
        CAST(floor(CAST(sum(adjm) AS DOUBLE) / count(*) + 0.5)
          AS BIGINT) / 1000000.0 AS adjusted_mean,
        CAST(floor(max(theta) * 1000000 + 0.5) AS BIGINT) / 1000000.0
          AS theta
      FROM adj GROUP BY 1 ORDER BY 1""",

    "t53_fim_transform" -> raw"""
      WITH wt AS (SELECT doc_id,
          list_filter(string_split_regex(text, '\s+'), x -> x != '') AS w
        FROM documents),
      c AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
          ('0x' || substr(md5('1:' || doc_id), 1, 15))::BIGINT
            % (CAST(len(w) AS BIGINT) + 1) AS c1
        FROM wt),
      c2 AS (SELECT *, c1 +
          ('0x' || substr(md5('2:' || doc_id), 1, 15))::BIGINT
            % (n - c1 + 1) AS c2
        FROM c)
      SELECT doc_id, n AS n_tokens, c1 AS cut1, c2 AS cut2,
        md5(array_to_string(
          ['<PRE>'] || w[1 : CAST(c1 AS INT)] ||
          ['<SUF>'] || w[CAST(c2 + 1 AS INT) : CAST(n AS INT)] ||
          ['<MID>'] || w[CAST(c1 + 1 AS INT) : CAST(c2 AS INT)],
          ' ')) AS fim_md5
      FROM c2 ORDER BY doc_id""",

    "t52_span_corruption" -> raw"""
      WITH wt AS (SELECT doc_id,
          list_filter(string_split_regex(text, '\s+'), x -> x != '') AS w
        FROM documents),
      tk AS (SELECT doc_id, t.i - 1 AS pos, w[t.i] AS tok
             FROM wt, unnest(generate_series(1, len(w))) AS t(i)),
      mk AS (SELECT *, ('0x' || substr(md5(doc_id || ':' || pos), 1, 15))
          ::BIGINT % 100 < 15 AS msk FROM tk),
      mr AS (SELECT doc_id, pos, tok, pos - row_number() OVER (
            PARTITION BY doc_id ORDER BY pos) AS grp
        FROM mk WHERE msk),
      rk AS (SELECT doc_id, grp, min(pos) AS run_start,
          count(*) AS run_len,
          string_agg(tok, ' ' ORDER BY pos) AS span_text
        FROM mr GROUP BY 1, 2),
      rk2 AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY run_start) - 1 AS k FROM rk),
      ann AS (SELECT mk.doc_id, mk.pos, mk.msk,
          CASE WHEN NOT mk.msk THEN mk.tok
               WHEN mk.pos = rk2.run_start
                 THEN '<extra_id_' || rk2.k || '>' END AS token_out
        FROM mk LEFT JOIN mr ON mr.doc_id = mk.doc_id AND mr.pos = mk.pos
                LEFT JOIN rk2 ON rk2.doc_id = mk.doc_id
                             AND rk2.grp = mr.grp),
      a1 AS (SELECT doc_id, count(*) AS n_tokens,
          count(*) FILTER (WHERE msk) AS n_masked,
          md5(string_agg(token_out, ' ' ORDER BY pos)) AS masked_md5
        FROM ann GROUP BY 1),
      a2 AS (SELECT doc_id, count(*) AS n_spans,
          md5(string_agg('<extra_id_' || k || '> ' || span_text,
            ' ' ORDER BY k)) AS targets_md5
        FROM rk2 GROUP BY 1)
      SELECT a1.doc_id, n_tokens, n_masked,
        coalesce(n_spans, 0) AS n_spans, masked_md5,
        coalesce(targets_md5, md5('')) AS targets_md5
      FROM a1 LEFT JOIN a2 ON a2.doc_id = a1.doc_id
      ORDER BY a1.doc_id""",

    // PqCodesCte + s11's ADC search chain vs the exact cosine truth.
    "s37_pq_recall" -> (NorthStar.PqCodesCte + raw""",
      ivfs AS (SELECT e.vec_id, cbv.code AS centroid_id,
          round(list_reduce(list_transform(list_zip(e.v, cbv.cv),
            p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y), 6) AS d2
        FROM e, cbv),
      a AS (SELECT vec_id, centroid_id AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY d2, centroid_id) AS rn FROM ivfs) WHERE rn = 1),
      qp AS (SELECT vec_id AS query_id, centroid_id AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY d2, centroid_id) AS pr FROM ivfs
          WHERE vec_id % 100 = 0) WHERE pr <= 2),
      cand AS (SELECT qp.query_id, a.vec_id AS neighbor_id
        FROM qp JOIN a ON a.cell = qp.cell WHERE a.vec_id != qp.query_id),
      qe AS (SELECT vec_id AS query_id, m, sv FROM ve
             WHERE vec_id % 100 = 0),
      dt AS (SELECT qe.query_id, cb.m, cb.code,
          round(list_reduce(list_transform(list_zip(qe.sv, cb.sv),
            p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y), 6) AS pd
        FROM qe JOIN cb USING (m)),
      adc AS (SELECT x.query_id, c.vec_id AS neighbor_id,
          CAST(sum(CAST(d.pd AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS s
        FROM cand x JOIN codes c ON c.vec_id = x.neighbor_id
             JOIN dt d ON d.query_id = x.query_id AND d.m = c.m
                      AND d.code = c.code
        GROUP BY 1, 2),
      apx AS (SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY CAST(s AS DOUBLE), neighbor_id) AS rk FROM adc)
        WHERE rk <= 5),
      nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm
             FROM e),
      qn AS (SELECT * FROM nn WHERE vec_id % 100 = 0),
      bs2 AS (SELECT qn.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_dot_product(qn.v, c.v) / (qn.nrm * c.nrm), 6)
            AS cosine
        FROM qn, nn c WHERE c.vec_id != qn.vec_id),
      truth2 AS (SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rk FROM bs2)
        WHERE rk <= 5),
      sc2 AS (SELECT t.query_id, count(*) AS n_truth,
          count(ap.neighbor_id) AS n_hits
        FROM truth2 t LEFT JOIN apx ap
          ON ap.query_id = t.query_id AND ap.neighbor_id = t.neighbor_id
        GROUP BY t.query_id)
      SELECT label, count(*) AS n_queries,
        CAST(sum(n_hits) AS BIGINT) AS n_hits,
        CAST(sum(n_truth) AS BIGINT) AS n_truth,
        CAST(floor(CAST(sum(n_hits) AS DOUBLE) * 1000000 /
          CAST(sum(n_truth) AS BIGINT) + 0.5) AS BIGINT) / 1000000.0
          AS recall
      FROM sc2 JOIN (SELECT vec_id, label FROM embeddings) lb
        ON lb.vec_id = sc2.query_id
      GROUP BY label ORDER BY label"""),

    // m16's dispatch + m14's corrupt rules + m15's entropy, one report.
    "m19_media_qa" -> """
      WITH sig(magic, fmt) AS (VALUES
        ('73', 'fmt_s'), ('74', 'fmt_t'), ('63', 'fmt_c'),
        ('61', 'fmt_a'), ('66', 'fmt_f'), ('76', 'fmt_v'),
        ('6B', 'fmt_k'), ('62', 'fmt_b')),
      p AS (SELECT doc_id, encode(text) AS payload FROM documents),
      fl AS (SELECT doc_id, coalesce(fmt, 'unknown') AS media_format,
          octet_length(payload) < 32 AS truncated,
          ('0x' || substr(hex(payload), 1, 2))::INT % 16 = 0 AS bad_magic
        FROM p LEFT JOIN sig
          ON upper(substr(hex(payload), 1, 2)) = sig.magic),
      hx AS (SELECT doc_id, hex(payload) AS hx FROM p),
      c AS (SELECT doc_id, length(hx) AS n,
          list_transform(['0','1','2','3','4','5','6','7','8','9',
            'A','B','C','D','E','F'],
            s -> length(hx) - length(replace(hx, s, ''))) AS cnt
        FROM hx),
      en AS (SELECT doc_id, CAST(floor(round(-list_reduce(
          list_prepend(0.0, list_transform(cnt,
            c -> CASE WHEN c > 0 THEN (CAST(c AS DOUBLE) / n) *
              ln(CAST(c AS DOUBLE) / n) ELSE 0.0 END)),
          (a, b) -> a + b), 6) * 1000000 + 0.5) AS BIGINT) AS em
        FROM c),
      g AS (SELECT media_format,
          count(*) AS n_payloads,
          count(*) FILTER (WHERE truncated OR bad_magic) AS n_corrupt,
          CAST(sum(em) AS BIGINT) AS sem
        FROM fl JOIN en USING (doc_id) GROUP BY 1)
      SELECT media_format, n_payloads, n_corrupt,
        CAST(floor(CAST(n_corrupt AS DOUBLE) * 1000000 / n_payloads
          + 0.5) AS BIGINT) / 1000000.0 AS corrupt_rate,
        CAST(floor(CAST(sem AS DOUBLE) / n_payloads + 0.5) AS BIGINT)
          / 1000000.0 AS mean_entropy
      FROM g ORDER BY media_format""",

    // g03's LPA chain labeling g09's modularity formula.
    "g17_community_modularity" -> s"""
      WITH ${NorthStar.MinhashCtes},
      filt AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      e AS (SELECT DISTINCT src, dst FROM (
          SELECT a AS src, b AS dst FROM filt WHERE a <> b
          UNION ALL SELECT b AS src, a AS dst FROM filt WHERE a <> b)),
      n AS (SELECT DISTINCT src AS id FROM e),
      l0 AS (SELECT id, id AS lbl FROM n),
      c1 AS (SELECT e.src, l.lbl, count(*) AS cnt
             FROM e JOIN l0 l ON l.id = e.dst GROUP BY 1, 2),
      p1 AS (SELECT src, lbl FROM (SELECT src, lbl, row_number()
          OVER (PARTITION BY src ORDER BY cnt DESC, lbl) AS rn FROM c1)
        WHERE rn = 1),
      l1 AS (SELECT n.id, coalesce(p1.lbl, n.id) AS lbl
             FROM n LEFT JOIN p1 ON p1.src = n.id),
      c2 AS (SELECT e.src, l.lbl, count(*) AS cnt
             FROM e JOIN l1 l ON l.id = e.dst GROUP BY 1, 2),
      p2 AS (SELECT src, lbl FROM (SELECT src, lbl, row_number()
          OVER (PARTITION BY src ORDER BY cnt DESC, lbl) AS rn FROM c2)
        WHERE rn = 1),
      l2 AS (SELECT n.id, coalesce(p2.lbl, n.id) AS lbl
             FROM n LEFT JOIN p2 ON p2.src = n.id),
      c3 AS (SELECT e.src, l.lbl, count(*) AS cnt
             FROM e JOIN l2 l ON l.id = e.dst GROUP BY 1, 2),
      p3 AS (SELECT src, lbl FROM (SELECT src, lbl, row_number()
          OVER (PARTITION BY src ORDER BY cnt DESC, lbl) AS rn FROM c3)
        WHERE rn = 1),
      l3 AS (SELECT n.id, coalesce(p3.lbl, n.id) AS lbl
             FROM n LEFT JOIN p3 ON p3.src = n.id),
      tot AS (SELECT count(*) AS m FROM filt),
      dg AS (SELECT doc_id, count(*) AS deg FROM (
          SELECT a AS doc_id FROM filt
          UNION ALL SELECT b FROM filt) GROUP BY 1),
      ds AS (SELECT l3.lbl AS community, CAST(sum(deg) AS BIGINT)
          AS d_sum, count(*) AS n_nodes
        FROM dg JOIN l3 ON l3.id = dg.doc_id GROUP BY 1),
      wi AS (SELECT la.lbl AS community, count(*) AS e_within
        FROM filt JOIN l3 la ON la.id = filt.a
                  JOIN l3 lb ON lb.id = filt.b
        WHERE la.lbl = lb.lbl GROUP BY 1)
      SELECT ds.community, n_nodes, d_sum,
        coalesce(e_within, 0) AS e_within, m,
        round(CAST(coalesce(e_within, 0) AS DOUBLE) / m -
          (CAST(d_sum AS DOUBLE) / CAST(m * 2 AS DOUBLE)) *
          (CAST(d_sum AS DOUBLE) / CAST(m * 2 AS DOUBLE)), 6) + 0.0
          AS q_contrib
      FROM ds LEFT JOIN wi USING (community), tot
      ORDER BY community""",

    // t22's passage chain feeding t20's BM25 chain, token-for-token.
    "t51_passage_retrieval" -> raw"""
      WITH wt0 AS (SELECT doc_id, string_split_regex(text, '\s+') AS w
                   FROM documents),
      p0 AS (SELECT doc_id, w, len(w) AS n,
          greatest(0, (len(w) - 16 + 11) // 12) AS np FROM wt0),
      pa AS (SELECT doc_id * 1000 + t.i AS doc_id,
          array_to_string(w[t.i*12+1 : t.i*12+16], ' ') AS text
        FROM p0, unnest(generate_series(0, np)) AS t(i)),
      tok AS (SELECT doc_id,
          unnest(string_split_regex(text, '\s+')) AS term FROM pa),
      dl AS (SELECT doc_id,
          CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS dl
        FROM pa),
      st AS (SELECT count(*) AS n_docs,
          CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      qt AS (SELECT * FROM tok
             WHERE term IN ('join', 'vector', 'spark', 'customer')),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM qt GROUP BY 1, 2),
      dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM qt
              GROUP BY 1),
      sc AS (SELECT tf.doc_id, CAST(round(
          ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            * (tf * (1.2 + 1.0))
            / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6)
          AS DECIMAL(18,6)) AS ts
        FROM tf JOIN dft USING (term) JOIN dl USING (doc_id), st),
      agg AS (SELECT doc_id, count(*) AS n_terms,
          CAST(sum(ts) AS DOUBLE) AS score FROM sc GROUP BY doc_id),
      r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id)
          AS "rank" FROM agg)
      SELECT doc_id, n_terms, score, CAST("rank" AS INT) AS "rank"
      FROM r WHERE "rank" <= 10 ORDER BY "rank"""",

    "q96_interval_merge" -> """
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS s_us,
          epoch_us(ts) + 300000000 AS e_us FROM events),
      m AS (SELECT *, max(e_us) OVER (PARTITION BY user_id
            ORDER BY s_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        FROM e),
      f AS (SELECT *, CASE WHEN prev_max IS NULL OR s_us > prev_max
            THEN 1 ELSE 0 END AS is_new FROM m),
      i AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
            ORDER BY s_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM f),
      g AS (SELECT user_id, island, count(*) AS n_ev,
          min(s_us) AS i_s, max(e_us) AS i_e
        FROM i GROUP BY 1, 2)
      SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
        count(*) AS n_islands,
        CAST(sum(i_e - i_s) AS BIGINT) AS covered_us
      FROM g GROUP BY 1 ORDER BY 1""",

    "q97_attribution_compare" -> """
      WITH dd AS (SELECT user_id, ts, event_type, row_number() OVER (
          PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type IN ('click', 'view', 'signup')),
      touch AS (SELECT user_id AS t_user, ts AS t_ts,
          event_type AS touch_type FROM dd WHERE rn = 1),
      conv AS (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'),
      lt AS (SELECT coalesce(touch_type, 'unattributed') AS channel,
          count(*) AS n_last_touch
        FROM conv ASOF LEFT JOIN touch
          ON conv.user_id = touch.t_user AND conv.ts >= touch.t_ts
        GROUP BY 1),
      fr AS (SELECT t_user, t_ts AS f_ts, touch_type AS f_type FROM (
          SELECT *, row_number() OVER (PARTITION BY t_user
            ORDER BY t_ts, touch_type) AS fr FROM touch) WHERE fr = 1),
      ft AS (SELECT coalesce(CASE WHEN f_ts <= ts THEN f_type END,
            'unattributed') AS channel, count(*) AS n_first_touch
        FROM conv LEFT JOIN fr ON fr.t_user = conv.user_id
        GROUP BY 1)
      SELECT coalesce(lt.channel, ft.channel) AS channel,
        coalesce(n_first_touch, 0) AS n_first_touch,
        coalesce(n_last_touch, 0) AS n_last_touch,
        coalesce(n_first_touch, 0) - coalesce(n_last_touch, 0) AS delta
      FROM lt FULL OUTER JOIN ft ON lt.channel = ft.channel
      ORDER BY 1""",

    "s36_neighbor_confusion" -> """
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
            FROM e),
      q AS (SELECT * FROM n WHERE vec_id % 20 = 0),
      bs AS (SELECT q.vec_id AS query_id, q.label AS query_label,
          c.vec_id AS neighbor_id, c.label AS neighbor_label,
          round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM q, n c WHERE c.vec_id != q.vec_id),
      t1 AS (SELECT * FROM (SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
        FROM bs) WHERE rk = 1)
      SELECT query_label, neighbor_label, count(*) AS n_queries
      FROM t1 GROUP BY 1, 2 ORDER BY 1, 2""",

    "q95_grouping_id" -> """
      SELECT o_orderstatus, o_orderpriority,
        CAST(grouping(o_orderstatus) AS INT) AS g_status,
        CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_price
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""",

    "m18_media_matrix" -> """
      WITH m AS (SELECT doc_id, source,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'image'
               WHEN octet_length(encode(text)) % 3 = 1 THEN 'audio'
               ELSE 'video' END AS media_type
        FROM documents),
      g AS (SELECT source, media_type, count(*) AS n_payloads,
          CAST(sum(n_bytes) AS BIGINT) AS total_bytes
        FROM m GROUP BY 1, 2)
      SELECT source, media_type, n_payloads, total_bytes,
        CAST(floor(CAST(n_payloads AS DOUBLE) * 1000000 /
          CAST(sum(n_payloads) OVER (PARTITION BY source) AS BIGINT)
          + 0.5) AS BIGINT) / 1000000.0 AS share_of_source
      FROM g ORDER BY source, media_type""",

    // d29's normalization chain with BOTH precedence windows.
    "d40_survivor_divergence" -> raw"""
      WITH d AS (SELECT doc_id, source,
          CAST(substring(source, 4) AS INT) % 3 AS tier,
          md5(trim(regexp_replace(regexp_replace(regexp_replace(
            lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\p{N}+', '0', 'g'),
            '\s+', ' ', 'g'))) AS nm
        FROM documents),
      k AS (SELECT *, row_number() OVER (PARTITION BY nm
            ORDER BY tier, doc_id) AS rp,
          row_number() OVER (PARTITION BY nm ORDER BY doc_id) AS ri
        FROM d)
      SELECT source,
        count(*) FILTER (WHERE rp = 1) AS n_priority_wins,
        count(*) FILTER (WHERE ri = 1) AS n_minid_wins,
        count(*) FILTER (WHERE rp = 1 AND ri != 1) AS n_taken_over,
        count(*) FILTER (WHERE rp = 1) - count(*) FILTER (WHERE ri = 1)
          AS net_change
      FROM k GROUP BY 1 ORDER BY 1""",

    "s35_probe_cost" -> s"""
      WITH ${NorthStar.AnnEvalCtes},
      cs AS (SELECT cell, count(*) AS cell_size FROM a GROUP BY 1),
      nv AS (SELECT count(*) AS nv FROM e)
      SELECT query_id, count(*) AS n_cells,
        CAST(sum(cell_size) AS BIGINT) AS n_candidates,
        CAST(floor(CAST(sum(cell_size) AS DOUBLE) * 1000000 / max(nv)
          + 0.5) AS BIGINT) / 1000000.0 AS pct_of_corpus
      FROM qp JOIN cs USING (cell), nv
      GROUP BY query_id ORDER BY query_id""",

    "g16_weighted_pagerank" -> s"""
      WITH ${NorthStar.MinhashCtes},
      fw AS (SELECT a, b, n_eq FROM pairs WHERE n_eq * 100 >= 800),
      ed AS (SELECT a AS src, b AS dst, CAST(n_eq AS BIGINT) AS w FROM fw
             UNION ALL SELECT b, a, CAST(n_eq AS BIGINT) FROM fw),
      nodes AS (SELECT src AS id FROM ed UNION SELECT dst FROM ed),
      ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS sw FROM ed
             GROUP BY src),
      p0 AS (SELECT id, CAST(10000000000 AS BIGINT) AS prl FROM nodes),
      c1 AS (SELECT ed.dst, CAST(floor(CAST(p.prl AS DOUBLE) * ed.w
          / ow.sw + 0.5) AS BIGINT) AS c
        FROM ed JOIN p0 p ON p.id = ed.src JOIN ow ON ow.src = ed.src),
      i1 AS (SELECT dst, CAST(sum(c) AS BIGINT) AS s FROM c1 GROUP BY dst),
      p1 AS (SELECT id, 1500000000 + $ppr AS prl
        FROM nodes LEFT JOIN i1 ON i1.dst = nodes.id),
      c2 AS (SELECT ed.dst, CAST(floor(CAST(p.prl AS DOUBLE) * ed.w
          / ow.sw + 0.5) AS BIGINT) AS c
        FROM ed JOIN p1 p ON p.id = ed.src JOIN ow ON ow.src = ed.src),
      i2 AS (SELECT dst, CAST(sum(c) AS BIGINT) AS s FROM c2 GROUP BY dst),
      p2 AS (SELECT id, 1500000000 + $ppr AS prl
        FROM nodes LEFT JOIN i2 ON i2.dst = nodes.id),
      c3 AS (SELECT ed.dst, CAST(floor(CAST(p.prl AS DOUBLE) * ed.w
          / ow.sw + 0.5) AS BIGINT) AS c
        FROM ed JOIN p2 p ON p.id = ed.src JOIN ow ON ow.src = ed.src),
      i3 AS (SELECT dst, CAST(sum(c) AS BIGINT) AS s FROM c3 GROUP BY dst),
      p3 AS (SELECT id, 1500000000 + $ppr AS prl
        FROM nodes LEFT JOIN i3 ON i3.dst = nodes.id)
      SELECT id, CAST(prl AS DOUBLE) / 10000000000.0 AS wpagerank
      FROM p3 ORDER BY id""",

    // sgl is the same shingle chain the minhash oracles use; unreferenced
    // CTEs in the interpolated block are never evaluated.
    "t50_gram_spectrum" -> s"""
      WITH ${NorthStar.MinhashCtes},
      g AS (SELECT unnest(sh) AS g FROM sgl),
      dfc AS (SELECT g, count(*) AS df FROM g GROUP BY 1),
      sp AS (SELECT df, count(*) AS n_grams FROM dfc GROUP BY 1)
      SELECT df, n_grams,
        CAST(floor(CAST(n_grams AS DOUBLE) * 1000000 /
          CAST(sum(n_grams) OVER () AS BIGINT) + 0.5) AS BIGINT)
          / 1000000.0 AS share
      FROM sp QUALIFY df <= 20 ORDER BY df""",

    "s34_recall_by_label" -> s"""
      WITH ${NorthStar.AnnEvalCtes},
      sc AS (SELECT t.query_id, count(*) AS n_truth,
          count(ap.neighbor_id) AS n_hits
        FROM truth t LEFT JOIN approxr ap
          ON ap.query_id = t.query_id AND ap.neighbor_id = t.neighbor_id
        GROUP BY t.query_id),
      lb AS (SELECT vec_id, label FROM embeddings)
      SELECT label, count(*) AS n_queries,
        CAST(sum(n_hits) AS BIGINT) AS n_hits,
        CAST(sum(n_truth) AS BIGINT) AS n_truth,
        CAST(floor(CAST(sum(n_hits) AS DOUBLE) * 1000000 /
          CAST(sum(n_truth) AS BIGINT) + 0.5) AS BIGINT) / 1000000.0
          AS recall
      FROM sc JOIN lb ON lb.vec_id = sc.query_id
      GROUP BY label ORDER BY label""",

    "q94_purchase_interval" -> """
      WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
          lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders),
      g AS (SELECT o.o_custkey, o.o_orderkey, c_mktsegment,
          CAST(date_diff('day', CAST(prev AS DATE),
            CAST(o_orderdate AS DATE)) AS BIGINT) AS gap
        FROM o JOIN customer ON o_custkey = c_custkey
        WHERE prev IS NOT NULL),
      w AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
            ORDER BY gap, o_custkey, o_orderkey) AS rn,
          count(*) OVER (PARTITION BY c_mktsegment) AS n FROM g)
      SELECT c_mktsegment, count(*) AS n_gaps,
        CAST(floor(CAST(sum(gap) AS DOUBLE) * 1000000 / count(*) + 0.5)
          AS BIGINT) / 1000000.0 AS mean_days,
        min(gap) FILTER (WHERE rn * 100 >= n * 50) AS p50_days,
        min(gap) FILTER (WHERE rn * 100 >= n * 90) AS p90_days,
        max(gap) AS max_days
      FROM w GROUP BY 1 ORDER BY 1""",

    "q91_lead_time" -> """
      WITH j AS (SELECT l_suppkey, l_orderkey, l_linenumber,
          CAST(date_diff('day', CAST(o_orderdate AS DATE),
            CAST(l_shipdate AS DATE)) AS BIGINT) AS lat
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      w AS (SELECT *, row_number() OVER (PARTITION BY l_suppkey
            ORDER BY lat, l_orderkey, l_linenumber) AS rn,
          count(*) OVER (PARTITION BY l_suppkey) AS n FROM j)
      SELECT l_suppkey, count(*) AS n_items,
        min(lat) AS min_days, max(lat) AS max_days,
        CAST(floor(CAST(sum(lat) AS DOUBLE) * 1000000 / count(*) + 0.5)
          AS BIGINT) / 1000000.0 AS mean_days,
        min(lat) FILTER (WHERE rn * 100 >= n * 50) AS p50_days,
        min(lat) FILTER (WHERE rn * 100 >= n * 95) AS p95_days,
        CAST(floor(CAST(count(*) FILTER (WHERE lat > 365) AS DOUBLE) *
          1000000 / count(*) + 0.5) AS BIGINT) / 1000000.0 AS late_rate
      FROM w GROUP BY 1 ORDER BY 1""",

    "t47_keyness_g2" -> raw"""
      WITH tok AS (SELECT source, g AS term
          FROM documents, unnest(string_split_regex(lower(text), '\s+'))
            AS t(g) WHERE g != ''),
      st AS (SELECT source, term, count(*) AS a FROM tok GROUP BY 1, 2),
      ttot AS (SELECT term, CAST(sum(a) AS BIGINT) AS tt FROM st
               GROUP BY 1),
      stot AS (SELECT source, CAST(sum(a) AS BIGINT) AS stt FROM st
               GROUP BY 1),
      ctot AS (SELECT CAST(sum(stt) AS BIGINT) AS ct FROM stot),
      sc AS (SELECT st.source, st.term, a, tt - a AS b,
          CAST(stt AS DOUBLE) * tt / ct AS e1,
          CAST(ct - stt AS DOUBLE) * tt / ct AS e2
        FROM st JOIN ttot USING (term) JOIN stot USING (source), ctot
        WHERE a >= 20 AND tt - a >= 1),
      lg AS (SELECT *, round(ln(a / e1), 6) AS la,
          round(ln(b / e2), 6) AS lb FROM sc),
      gm AS (SELECT source, term, a, b,
          CAST(floor((a * la + b * lb) * 2000000 + 0.5) AS BIGINT) AS g2m
        FROM lg WHERE la > 0),
      r AS (SELECT *, row_number() OVER (PARTITION BY source
          ORDER BY g2m DESC, term) AS rn FROM gm)
      SELECT source, term, a AS n_in_source, b AS n_elsewhere,
        g2m / 1000000.0 AS g2
      FROM r WHERE rn <= 5 ORDER BY source, g2 DESC, term""",

    // Two copies of the s05 centroid chain (vec_id parity), joined on
    // label; the shift is the index-ordered fold distance.
    "s31_centroid_shift" -> """
      WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings),
      x0 AS (SELECT label, vec_id, t.i, v[t.i] AS comp
             FROM e, unnest(generate_series(1, len(v))) AS t(i)
             WHERE vec_id % 2 = 0),
      p0 AS (SELECT label, i, vec_id // 256 AS chunk,
              list_reduce(list(comp ORDER BY vec_id), (a, b) -> a + b) AS ps,
              count(*) AS cnt
             FROM x0 GROUP BY label, i, chunk),
      m0 AS (SELECT label, i,
              list_reduce(list(ps ORDER BY chunk), (a, b) -> a + b)
                / CAST(sum(cnt) AS BIGINT) AS mean
             FROM p0 GROUP BY label, i),
      cv0 AS (SELECT label, list(mean ORDER BY i) AS cv0 FROM m0
              GROUP BY label),
      x1 AS (SELECT label, vec_id, t.i, v[t.i] AS comp
             FROM e, unnest(generate_series(1, len(v))) AS t(i)
             WHERE vec_id % 2 = 1),
      p1 AS (SELECT label, i, vec_id // 256 AS chunk,
              list_reduce(list(comp ORDER BY vec_id), (a, b) -> a + b) AS ps,
              count(*) AS cnt
             FROM x1 GROUP BY label, i, chunk),
      m1 AS (SELECT label, i,
              list_reduce(list(ps ORDER BY chunk), (a, b) -> a + b)
                / CAST(sum(cnt) AS BIGINT) AS mean
             FROM p1 GROUP BY label, i),
      cv1 AS (SELECT label, list(mean ORDER BY i) AS cv1 FROM m1
              GROUP BY label),
      n0 AS (SELECT label, count(*) AS n_even FROM e
             WHERE vec_id % 2 = 0 GROUP BY label),
      n1 AS (SELECT label, count(*) AS n_odd FROM e
             WHERE vec_id % 2 = 1 GROUP BY label)
      SELECT label, n_even, n_odd,
        round(list_reduce(list_transform(list_zip(cv0, cv1),
          q -> (q[1] - q[2]) * (q[1] - q[2])), (a, b) -> a + b), 6)
          AS shift_d2
      FROM cv0 JOIN cv1 USING (label) JOIN n0 USING (label)
        JOIN n1 USING (label)
      ORDER BY label""",

    "g14_assortativity" -> s"""
      WITH ${NorthStar.MinhashCtes},
      filt AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      ed AS (SELECT a, b FROM filt UNION ALL SELECT b, a FROM filt),
      deg AS (SELECT a AS id, count(*) AS d FROM ed GROUP BY 1),
      j AS (SELECT dx.d AS dx, dy.d AS dy
        FROM ed JOIN deg dx ON dx.id = ed.a JOIN deg dy ON dy.id = ed.b),
      mo AS (SELECT count(*) AS n, CAST(sum(dx) AS BIGINT) AS sx,
          CAST(sum(dy) AS BIGINT) AS sy,
          CAST(sum(dx * dx) AS BIGINT) AS sxx,
          CAST(sum(dy * dy) AS BIGINT) AS syy,
          CAST(sum(dx * dy) AS BIGINT) AS sxy FROM j),
      nn AS (SELECT count(*) AS n_nodes FROM deg)
      SELECT n_nodes, CAST(n / 2 AS BIGINT) AS n_edges,
        round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
          (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) *
           sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
          AS assortativity
      FROM mo, nn""",

    // m03's frame chain, signatures truncated to one hex char.
    "m17_frame_dup_ratio" -> """
      WITH f AS (SELECT doc_id, j AS frame_idx,
          j * greatest(1, octet_length(encode(text)) // 4) + 1 AS off,
          hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
        FROM documents, generate_series(0, 3) t(j)),
      fr AS (SELECT doc_id,
          substr(md5(substring(hx, CAST((off - 1) * 2 + 1 AS INT), 32)),
            1, 1) AS sig
        FROM f WHERE off <= nb),
      g AS (SELECT doc_id, count(*) AS n_frames,
          count(DISTINCT sig) AS n_distinct_sigs FROM fr GROUP BY 1)
      SELECT doc_id, n_frames, n_distinct_sigs,
        CAST(floor(CAST(n_frames - n_distinct_sigs AS DOUBLE) * 1000000
          / n_frames + 0.5) AS BIGINT) / 1000000.0 AS dup_ratio
      FROM g ORDER BY doc_id""",

    "d38_cross_lang_dup" -> s"""
      WITH ${NorthStar.MinhashCtes},
      filt AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      lp AS (SELECT least(da.lang, db.lang) AS lang_a,
          greatest(da.lang, db.lang) AS lang_b
        FROM filt JOIN documents da ON da.doc_id = filt.a
                  JOIN documents db ON db.doc_id = filt.b),
      g AS (SELECT lang_a, lang_b, count(*) AS n_pairs FROM lp
            GROUP BY 1, 2)
      SELECT lang_a, lang_b, n_pairs,
        CAST(floor(CAST(n_pairs AS DOUBLE) * 1000000 /
          CAST(sum(n_pairs) OVER () AS BIGINT) + 0.5) AS BIGINT)
          / 1000000.0 AS share
      FROM g ORDER BY lang_a, lang_b""",

    "k14_partition_skew" -> s"""
      WITH r AS (${KafkaParity.replaySql}),
      g AS (SELECT "partition", count(*) AS n_msgs FROM r GROUP BY 1)
      SELECT "partition", n_msgs,
        CAST(floor(CAST(n_msgs AS DOUBLE) * 8000000 /
          CAST(sum(n_msgs) OVER () AS BIGINT) + 0.5) AS BIGINT)
          / 1000000.0 AS ratio_to_ideal
      FROM g ORDER BY 1""",

    // d08's recursive component chain + the certified pair set; density
    // is the one closed double formula.
    "d37_cluster_density" -> s"""
      WITH RECURSIVE ${NorthStar.MinhashCtes},
      filt AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      edges(src, dst) AS (
        SELECT a, b FROM filt UNION SELECT b, a FROM filt),
      reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
             FROM reach GROUP BY src),
      mem AS (SELECT cluster_id, count(*) AS n_members FROM cl
              GROUP BY 1),
      ec AS (SELECT cl.cluster_id, count(*) AS n_edges
             FROM filt JOIN cl ON cl.doc_id = filt.a GROUP BY 1)
      SELECT mem.cluster_id, mem.n_members, ec.n_edges,
        CAST(mem.n_members * (mem.n_members - 1) / 2 AS BIGINT)
          AS n_implied,
        CAST(mem.n_members * (mem.n_members - 1) / 2 - ec.n_edges
          AS BIGINT) AS n_missing_edges,
        round((ec.n_edges * 2.0) /
          (mem.n_members * (mem.n_members - 1)), 6) AS density
      FROM mem JOIN ec ON mem.cluster_id = ec.cluster_id
      ORDER BY mem.n_members DESC, mem.cluster_id""")
}
