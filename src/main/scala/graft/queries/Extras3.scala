package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators._
import graft.sources.KafkaSource

/** Round-7 additions: market-basket association rules, per-key OLS trend
  * lines, a referential-integrity (orphan-FK) audit, autocorrelation of
  * the daily value series, decile gains/lift tables, EXACT radius search
  * with triangle-inequality cell pruning, kNN majority-vote
  * classification, per-source conductance of the near-dup graph, and a
  * watermark-sizing report from exact lateness quantiles. Same oracle
  * discipline as [[Extras]]: every double is a closed formula over exact
  * integer/decimal moments, rounded at 6, token-identical in the DuckDB
  * oracle.
  */
object Extras3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dec2 = DecimalType(18, 2)

  /** Epoch-day integer for an NTZ timestamp — the exact OLS/ACF x axis. */
  private def epochDay(ts: Column): Column =
    datediff(date_trunc("day", ts).cast("date"), to_date(lit("1970-01-01")))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Market-basket association rules over order baskets of part brands:
    // support / confidence / lift with exact integer counts. The basket
    // self-join is bounded by brand cardinality (25), so per-basket
    // fanout is constant; item totals and the basket count broadcast.
    // At 100 TB this is one shuffle of the distinct (basket, item) pairs.
    "q80_assoc_rules" -> { (s, dir) =>
      val items = t(s, dir, "lineitem")
        .join(t(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
        .distinct()
      val nB = items.select(col("basket")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val itemN = items.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
      val a = items.select(col("basket"), col("item").as("ant"))
      val b = items.select(col("basket"), col("item").as("cons"))
      a.join(b, Seq("basket"))
        .filter(col("ant") =!= col("cons"))
        .groupBy(col("ant"), col("cons"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 5)
        .join(broadcast(itemN.select(col("item").as("ant"),
          col("n_item").as("n_a"))), Seq("ant"))
        .join(broadcast(itemN.select(col("item").as("cons"),
          col("n_item").as("n_c"))), Seq("cons"))
        .crossJoin(broadcast(nB))
        .select(col("ant"), col("cons"), col("n_ab"),
          round(col("n_ab").cast("double") / col("n_baskets"), 6)
            .as("support"),
          round(col("n_ab").cast("double") / col("n_a"), 6)
            .as("confidence"),
          round((col("n_ab").cast("double") * col("n_baskets")) /
            (col("n_a").cast("double") * col("n_c")), 6).as("lift"))
        .orderBy(col("ant"), col("cons"))
    },

    // Per-event-type linear trend of the daily value series: OLS slope,
    // intercept and R² from five exact moments (integer epoch-day x,
    // DECIMAL daily-sum y). The formulas are single closed double
    // expressions shared token-for-token with the oracle — no engine
    // regr_* aggregate is trusted.
    "q81_trend_ols" -> { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast(dec2)).cast(dec2).as("y"))
        .select(col("event_type"), epochDay(col("day")).as("x"), col("y"))
      val g = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nb"),
          sum(col("x")).as("sxi"), sum(col("y")).as("syd"),
          sum(col("x") * col("y")).as("sxyd"),
          sum(col("x").cast("long") * col("x")).as("sx2i"),
          sum(col("y") * col("y")).as("sy2d"))
      val n = col("nb").cast("double")
      val sx = col("sxi").cast("double")
      val sy = col("syd").cast("double")
      val sxy = col("sxyd").cast("double")
      val sx2 = col("sx2i").cast("double")
      val sy2 = col("sy2d").cast("double")
      val dd = n * sx2 - sx * sx
      val dy = n * sy2 - sy * sy
      g.select(col("event_type"), col("nb").cast("long").as("n_days"),
          when(dd > 0, round((n * sxy - sx * sy) / dd, 6)).as("slope"),
          when(dd > 0, round(
            (sy - ((n * sxy - sx * sy) / dd) * sx) / n, 6)).as("intercept"),
          when(dd * dy > 0, round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (dd * dy), 6))
            .as("r2"))
        .orderBy(col("event_type"))
    },

    // Referential-integrity audit: orphan-FK counts across every edge of
    // the star schema, plus one deliberately-stale dimension (parts with
    // p_size > 10) to exercise the orphan path. Each edge is a left-anti
    // join (parent side broadcasts when small); NULL FKs are counted
    // separately, not as orphans — matching NOT EXISTS semantics.
    "q82_fk_audit" -> { (s, dir) =>
      def edge(name: String, child: DataFrame, key: String,
          parent: DataFrame, pkey: String): DataFrame = {
        val c = child.select(col(key).as("k"))
        val p = parent.select(col(pkey).as("pk"))
        val orph = c.filter(col("k").isNotNull)
          .join(p, col("k") === col("pk"), "left_anti")
          .agg(count(lit(1)).as("n_orphan"),
            countDistinct(col("k")).as("n_orphan_keys"),
            min(col("k")).cast("long").as("min_orphan"),
            max(col("k")).cast("long").as("max_orphan"))
        c.agg(count(lit(1)).as("n_child"),
            count(when(col("k").isNull, 1)).as("n_null"))
          .crossJoin(orph)
          .select(lit(name).as("relation"), col("n_child"), col("n_null"),
            col("n_orphan"), col("n_orphan_keys"), col("min_orphan"),
            col("max_orphan"))
      }
      val li = t(s, dir, "lineitem"); val od = t(s, dir, "orders")
      val pt = t(s, dir, "part"); val sp = t(s, dir, "supplier")
      val cu = t(s, dir, "customer"); val na = t(s, dir, "nation")
      val re = t(s, dir, "region"); val ev = t(s, dir, "events")
      Seq(
        edge("customer.c_nationkey->nation", cu, "c_nationkey",
          na, "n_nationkey"),
        edge("events.user_id->customer", ev, "user_id", cu, "c_custkey"),
        edge("lineitem.l_orderkey->orders", li, "l_orderkey",
          od, "o_orderkey"),
        edge("lineitem.l_partkey->part", li, "l_partkey", pt, "p_partkey"),
        edge("lineitem.l_partkey->part_size_gt10", li, "l_partkey",
          pt.filter(col("p_size") > 10), "p_partkey"),
        edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
          sp, "s_suppkey"),
        edge("nation.n_regionkey->region", na, "n_regionkey",
          re, "r_regionkey"),
        edge("orders.o_custkey->customer", od, "o_custkey",
          cu, "c_custkey"))
        .reduce(_ unionByName _)
        .orderBy(col("relation"))
    },

    // Autocorrelation of the daily total value series at lags 1..7 —
    // the seasonality probe before fitting any forecast. Pairs come from
    // an equi-join of the daily series against itself shifted by the lag
    // (gap days simply produce no pair); the per-lag Pearson is the q66
    // closed formula over exact DECIMAL moments.
    "q83_acf" -> { (s, dir) =>
      val daily = t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast(dec2)).cast(dec2).as("y"))
        .select(epochDay(col("day")).as("x"), col("y"))
      val a = daily
        .withColumn("lag", explode(sequence(lit(1), lit(7))))
        .select(col("lag"), (col("x") + col("lag")).as("xt"),
          col("y").as("ya"))
      val b = daily.select(col("x").as("xt"), col("y").as("yb"))
      val g = a.join(b, Seq("xt"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("nb"),
          sum(col("ya")).as("sxd"), sum(col("yb")).as("syd"),
          sum(col("ya") * col("yb")).as("sxyd"),
          sum(col("ya") * col("ya")).as("sx2d"),
          sum(col("yb") * col("yb")).as("sy2d"))
      val n = col("nb").cast("double")
      val sx = col("sxd").cast("double")
      val sy = col("syd").cast("double")
      val sxy = col("sxyd").cast("double")
      val sx2 = col("sx2d").cast("double")
      val sy2 = col("sy2d").cast("double")
      g.select(col("lag").cast("int").as("lag"),
          col("nb").cast("long").as("n_pairs"),
          when((n * sx2 - sx * sx) * (n * sy2 - sy * sy) > 0,
            round((n * sxy - sx * sy) /
              sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6))
            .as("acf"))
        .orderBy(col("lag"))
    },

    // Decile gains/lift table per market segment: customers ranked by
    // total spend, cut into ntile(10) deciles (fully-ordered -> ties
    // deterministic), per-decile revenue share, cumulative share and
    // lift vs a uniform allocation. The window partitions by segment —
    // the same per-key hot-partition exposure as every ranked window
    // here (AsOfJoin scaladoc); the input is already one-row-per-customer.
    "q84_decile_lift" -> { (s, dir) =>
      val spend = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(sum(col("o_totalprice").cast(dec2)).cast(dec2).as("spend"))
      val d = spend.withColumn("decile", ntile(10).over(
        Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("spend").desc, col("c_custkey"))))
      val byDec = d.groupBy(col("c_mktsegment"), col("decile"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("spend")).cast(dec2).as("revenue"))
      val segW = Window.partitionBy(col("c_mktsegment"))
      val cumW = segW.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDec
        .withColumn("seg_rev", sum(col("revenue")).over(segW).cast(dec2))
        .withColumn("seg_n", sum(col("n_customers")).over(segW))
        .withColumn("cum_rev", sum(col("revenue")).over(cumW).cast(dec2))
        .select(col("c_mktsegment"), col("decile").cast("int").as("decile"),
          // DOUBLE final over the exact DECIMAL decile sum (the
          // driver's hash is type-sensitive to DECIMAL renderings)
          col("n_customers"), col("revenue").cast("double").as("revenue"),
          round(col("revenue").cast("double") / col("seg_rev"), 6)
            .as("share"),
          round(col("cum_rev").cast("double") / col("seg_rev"), 6)
            .as("cum_share"),
          round((col("revenue").cast("double") / col("seg_rev")) /
            (col("n_customers").cast("double") / col("seg_n")), 6)
            .as("lift"))
        .orderBy(col("c_mktsegment"), col("decile"))
    },

    // Exact radius search with triangle-inequality cell pruning — the
    // brute-force oracle certifies that pruning loses nothing (see
    // Similarity.rangeSearch).
    "s27_range_search" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.rangeSearch(e, e.filter(col("vec_id") % 100 === 0),
          minCosine = 0.25)
        .orderBy(col("query_id"), col("neighbor_id"))
    },

    // kNN majority-vote classification of a query panel against the
    // labeled corpus (see Similarity.knnClassify).
    "s28_knn_classify" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.knnClassify(e, e.filter(col("vec_id") % 50 === 0))
        .orderBy(col("query_id"))
    },

    // Conductance of the near-dup graph partitioned by document source:
    // cut edges / min(vol, 2m - vol) per source — the cut-ratio
    // complement of g09's modularity, exposing sources whose duplicates
    // mostly cross source boundaries (plagiarism/mirroring). Exact
    // integer edge counts over the SAME certified minhash pair set as
    // g01-g10; one closed double formula.
    "g11_source_conductance" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val src = d.select(col("doc_id"), col("source"))
      val edges = Shared.pairs(s, dir).select(col("a"), col("b"))
        .join(src.select(col("doc_id").as("a"),
          col("source").as("sa")), Seq("a"))
        .join(src.select(col("doc_id").as("b"),
          col("source").as("sb")), Seq("b"))
      val m = edges.agg(count(lit(1)).as("m_edges"))
      val intra = edges.filter(col("sa") === col("sb"))
        .groupBy(col("sa").as("source"))
        .agg(count(lit(1)).as("intra_edges"))
      val cut = edges.filter(col("sa") =!= col("sb"))
        .select(explode(array(col("sa"), col("sb"))).as("source"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("cut_edges"))
      intra.join(cut, Seq("source"), "full_outer")
        .na.fill(0L, Seq("intra_edges", "cut_edges"))
        .crossJoin(broadcast(m))
        .withColumn("vol", lit(2) * col("intra_edges") + col("cut_edges"))
        .select(col("source"), col("intra_edges"), col("cut_edges"),
          col("vol"),
          when(least(col("vol"), lit(2) * col("m_edges") - col("vol")) > 0,
            round(col("cut_edges").cast("double") /
              least(col("vol"), lit(2) * col("m_edges") - col("vol")), 6))
            .as("conductance"))
        .orderBy(col("source"))
    },

    // Watermark sizing from EXACT lateness quantiles: per partition, the
    // p50/p95/p99/max of (running-max event time − event time) over the
    // replay relation in offset order — p99 is the delay bound a
    // `withWatermark` should carry to keep ≤1% late drops. percentile()
    // and DuckDB's quantile_cont share the p·(n−1) linear-interpolation
    // definition, and the inputs are integer micros, so the quantiles
    // are exact doubles in both engines.
    "k12_watermark_sizing" -> { (s, dir) =>
      val w = Window.partitionBy(col("partition")).orderBy(col("offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      KafkaSource.replay(t(s, dir, "events"))
        .select(col("partition"), col("offset"),
          col("timestamp").cast("timestamp").as("timestamp"))
        .withColumn("late_us",
          unix_micros(max(col("timestamp")).over(w)) -
            unix_micros(col("timestamp")))
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(late_us, 0.5D)"), 6).as("p50_us"),
          round(expr("percentile(late_us, 0.95D)"), 6).as("p95_us"),
          round(expr("percentile(late_us, 0.99D)"), 6).as("p99_us"),
          max(col("late_us")).as("max_us"))
        .orderBy(col("partition"))
    },

    // Last-touch attribution: each 'purchase' conversion is credited to
    // the user's latest touch event (click/view/signup — errors are not
    // touches) at or before the purchase time — the as-of join IS the
    // attribution operator (same AsOfJoin core as q20/q67). Touches are
    // deduped per (user, ts) first (as-of requires a unique right side);
    // purchases with no prior touch fall into 'unattributed'.
    "q85_attribution" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val dw = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val touch = ev
        .filter(col("event_type").isin("click", "view", "signup"))
        .withColumn("rn", row_number().over(dw)).filter(col("rn") === 1)
        .select(col("user_id").as("t_user"), col("ts").as("t_ts"),
          col("event_type").as("touch_type"))
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      AsOfJoin.leftAsOf(conv, touch, "user_id", "ts", "t_user", "t_ts",
          Seq("touch_type"))
        .groupBy(coalesce(col("touch_type"), lit("unattributed"))
          .as("channel"))
        .agg(count(lit(1)).as("n_conversions"),
          // exact DECIMAL sum internally; DOUBLE final — output schemas
          // avoid DECIMAL everywhere (driver-hash type discipline,
          // gated by VerifySpec)
          sum(col("value").cast(dec2)).cast(dec2).cast("double")
            .as("revenue"))
        .orderBy(col("channel"))
    },

    // RFM segmentation per market segment: recency / frequency /
    // monetary quintiles (ntile(5), fully ordered -> deterministic),
    // concatenated into the classic 3-digit RFM code. The anchor date is
    // the corpus max order date (broadcast 1-row), so the report is
    // reproducible from the data alone.
    "q86_rfm_segments" -> { (s, dir) =>
      val maxd = t(s, dir, "orders")
        .agg(max(col("o_orderdate")).as("maxd"))
      val base = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec2)).cast(dec2).as("monetary"))
        .crossJoin(broadcast(maxd))
        .withColumn("recency_days",
          datediff(col("maxd").cast("date"), col("last_order").cast("date")))
      def q5(order: Seq[Column]): Column = ntile(5).over(
        Window.partitionBy(col("c_mktsegment")).orderBy(order: _*))
      val coded = base
        .withColumn("rq", q5(Seq(col("recency_days").asc,
          col("c_custkey").asc)))
        .withColumn("fq", q5(Seq(col("n_orders").desc,
          col("c_custkey").asc)))
        .withColumn("mq", q5(Seq(col("monetary").desc,
          col("c_custkey").asc)))
        .withColumn("rfm_code", concat(col("rq").cast("string"),
          col("fq").cast("string"), col("mq").cast("string")))
      coded.groupBy(col("c_mktsegment"), col("rfm_code"))
        .agg(count(lit(1)).as("n_customers"),
          // exact DECIMAL sum internally; DOUBLE final (type-stable vs
          // the driver's hash)
          sum(col("monetary")).cast(dec2).cast("double")
            .as("total_monetary"),
          round(sum(col("monetary")).cast("double") / count(lit(1)), 6)
            .as("avg_monetary"))
        .orderBy(col("c_mktsegment"), col("rfm_code"))
    },

    // Audience overlap matrix: pairwise Jaccard / overlap coefficient /
    // cosine between event types' distinct-user sets — exact integer
    // intersection counts from ONE self-join on user (bounded by the
    // type cardinality per user), set sizes broadcast.
    "q87_audience_overlap" -> { (s, dir) =>
      val tu = t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
      val sizes = tu.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"))
      val a = tu.select(col("event_type").as("type_a"), col("user_id"))
      val b = tu.select(col("event_type").as("type_b"), col("user_id"))
      a.join(b, Seq("user_id"))
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_inter"))
        .join(broadcast(sizes.select(col("event_type").as("type_a"),
          col("n_users").as("na"))), Seq("type_a"))
        .join(broadcast(sizes.select(col("event_type").as("type_b"),
          col("n_users").as("nb"))), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_inter"),
          col("na"), col("nb"),
          round(col("n_inter").cast("double") /
            (col("na") + col("nb") - col("n_inter")), 6).as("jaccard"),
          round(col("n_inter").cast("double") /
            least(col("na"), col("nb")), 6).as("overlap_coef"),
          round(col("n_inter").cast("double") /
            sqrt(col("na").cast("double") * col("nb")), 6).as("cosine"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // Local clustering coefficient per node of the near-dup graph:
    // closed wedges / possible wedges, the per-node complement of g02's
    // global triangle count. Wedges come from one self-join of the
    // symmetrized edge list; each wedge closes iff its endpoints are an
    // edge in the canonical (a<b) set. Same certified minhash pair
    // set as g01-g11.
    "g12_clustering_coeff" -> { (s, dir) =>
      val edges = Shared.pairs(s, dir)
        .select(col("a"), col("b"))
      val und = edges.select(col("a").as("v"), col("b").as("w"))
        .unionByName(edges.select(col("b").as("v"), col("a").as("w")))
      val deg = und.groupBy(col("v")).agg(count(lit(1)).as("degree"))
      val wedges = und.select(col("v"), col("w").as("x"))
        .join(und.select(col("v"), col("w").as("y")), Seq("v"))
        .filter(col("x") < col("y"))
      val tri = wedges
        .join(edges.select(col("a").as("x"), col("b").as("y")),
          Seq("x", "y"))
        .groupBy(col("v")).agg(count(lit(1)).as("n_triangles"))
      deg.join(tri, Seq("v"), "left")
        .na.fill(0L, Seq("n_triangles"))
        .select(col("v").as("doc_id"), col("degree"), col("n_triangles"),
          when(col("degree") >= 2, round(
            (lit(2) * col("n_triangles")).cast("double") /
              (col("degree") * (col("degree") - 1)), 6))
            .as("clustering_coef"))
        .orderBy(col("doc_id"))
    },

    // Vocabulary coverage curve per language: what fraction of the token
    // mass the top-{10,100,1000} terms cover — the tokenizer-budget
    // report. Exact integer masses; the rank window partitions by lang.
    "t45_vocab_coverage" -> { (s, dir) =>
      val terms = t(s, dir, "documents")
        .select(col("lang"), explode(filter(
          split(lower(col("text")), "\\s+"), x => x =!= lit("")))
          .as("term"))
        .groupBy(col("lang"), col("term"))
        .agg(count(lit(1)).as("f"))
      val tot = terms.groupBy(col("lang"))
        .agg(sum(col("f")).as("total_tokens"),
          count(lit(1)).as("n_terms"))
      val rk = Window.partitionBy(col("lang"))
        .orderBy(col("f").desc, col("term"))
      terms.withColumn("rk", row_number().over(rk))
        .withColumn("cutoff",
          explode(array(lit(10), lit(100), lit(1000))))
        .filter(col("rk") <= col("cutoff"))
        .groupBy(col("lang"), col("cutoff"))
        .agg(sum(col("f")).as("covered_tokens"))
        .join(broadcast(tot), Seq("lang"))
        .select(col("lang"), col("cutoff"), col("covered_tokens"),
          col("total_tokens"), col("n_terms"),
          round(col("covered_tokens").cast("double") /
            col("total_tokens"), 6).as("coverage"))
        .orderBy(col("lang"), col("cutoff"))
    },

    // Duplicate-inflation report: per source, how much character mass
    // the near-dup keep-one pass (d09's rule: keep each cluster's min
    // doc_id) would reclaim — the "why dedup" executive summary.
    // Composes the certified cluster chain with one join to documents.
    "d36_dup_inflation" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val pairs = Shared.pairs(s, dir).select(col("a"), col("b"))
      val dropped = Dedup.connectedComponents(pairs)
        .filter(col("id") =!= col("cluster"))
        .select(col("id").as("doc_id"), lit(true).as("is_dropped"))
      d.join(dropped, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("is_dropped"), 1)).as("n_dropped"),
          sum(col("n_chars")).as("total_chars"),
          coalesce(sum(when(col("is_dropped"), col("n_chars"))), lit(0L))
            .as("wasted_chars"))
        .select(col("source"), col("n_docs"), col("n_dropped"),
          col("total_chars"), col("wasted_chars"),
          when(col("total_chars") - col("wasted_chars") > 0, round(
            col("total_chars").cast("double") /
              (col("total_chars") - col("wasted_chars")), 6))
            .as("inflation"))
        .orderBy(col("source"))
    },

    // Pseudo-relevance feedback (Rocchio): expand each query vector with
    // the rank-ordered mean of its top-10 neighbors (q' = q + 0.5·mean),
    // then re-rank the corpus against q'. The feedback fold is
    // LEFT-TO-RIGHT IN RANK ORDER (bounded at k elements, so the
    // per-query buffer is constant) and the rerank reuses the broadcast-
    // panel plan — the corpus is scanned twice, shuffled never. Every
    // double operation is order-pinned, so the DuckDB oracle reproduces
    // the expanded vectors bit-for-bit.
    "s29_rocchio" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val qs = e.filter(col("vec_id") % 100 === 0)
      val top = Similarity.bruteForceTopK(e, qs, k = 10)
      val nvec = e.select(col("vec_id").as("neighbor_id"),
        col("embedding").cast("array<double>").as("nv"))
      // bounded per-query state: k (rank, vec) structs, folded in rank
      // order after sort_array — the m15/chunked-fold house pattern
      val fb = top.join(nvec, Seq("neighbor_id"))
        .groupBy(col("query_id"))
        .agg(sort_array(collect_list(struct(col("rank"), col("nv"))))
          .as("arr"))
        .select(col("query_id"),
          aggregate(expr("slice(arr, 2, size(arr) - 1)"),
            col("arr").getItem(0).getField("nv"),
            (acc, s) => zip_with(acc, s.getField("nv"),
              (x, y) => x + y)).as("acc"),
          size(col("arr")).as("k"))
      val qv = qs.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      val probes = fb.join(qv, Seq("query_id"))
        .select(col("query_id"),
          zip_with(col("qv"), col("acc"), (q, a) =>
            lit(1.0) * q + lit(0.5) * a / col("k")).as("qp"))
        .withColumn("np", sqrt(Similarity.dot(col("qp"), col("qp"))))
      val c = e.select(col("vec_id").as("neighbor_id"),
          col("embedding").cast("array<double>").as("vc"))
        .withColumn("nc", sqrt(Similarity.dot(col("vc"), col("vc"))))
      val scored = c.crossJoin(broadcast(probes))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cosine", round(
          Similarity.dot(col("qp"), col("vc")) / (col("np") * col("nc")),
          6))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("cosine"),
          col("rank"))
        .orderBy(col("query_id"), col("rank"))
    })

  val oracles: Map[String, String] = Map(

    "q80_assoc_rules" -> """
      WITH it AS (SELECT DISTINCT l_orderkey AS basket, p_brand AS item
          FROM lineitem JOIN part ON l_partkey = p_partkey),
      nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM it),
      ic AS (SELECT item, count(*) AS n_item FROM it GROUP BY 1),
      pc AS (SELECT x.item AS ant, y.item AS cons, count(*) AS n_ab
        FROM it x JOIN it y ON x.basket = y.basket AND x.item <> y.item
        GROUP BY 1, 2 HAVING count(*) >= 5)
      SELECT ant, cons, n_ab,
        round(CAST(n_ab AS DOUBLE) / n_baskets, 6) AS support,
        round(CAST(n_ab AS DOUBLE) / ia.n_item, 6) AS confidence,
        round((CAST(n_ab AS DOUBLE) * n_baskets) /
          (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) AS lift
      FROM pc JOIN ic ia ON pc.ant = ia.item
        JOIN ic ib ON pc.cons = ib.item, nb
      ORDER BY ant, cons""",

    "q81_trend_ols" -> """
      WITH daily AS (SELECT event_type,
          datediff('day', DATE '1970-01-01',
            CAST(date_trunc('day', ts) AS DATE)) AS x,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
        FROM events GROUP BY event_type, date_trunc('day', ts)),
      g AS (SELECT event_type, count(*) AS nb,
          CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
          CAST(sum(x * y) AS DOUBLE) AS sxy,
          CAST(sum(CAST(x AS BIGINT) * x) AS DOUBLE) AS sx2,
          CAST(sum(y * y) AS DOUBLE) AS sy2
        FROM daily GROUP BY 1)
      SELECT event_type, CAST(nb AS BIGINT) AS n_days,
        CASE WHEN (nb * sx2 - sx * sx) > 0
          THEN round((nb * sxy - sx * sy) / (nb * sx2 - sx * sx), 6)
        END AS slope,
        CASE WHEN (nb * sx2 - sx * sx) > 0
          THEN round((sy - ((nb * sxy - sx * sy) /
            (nb * sx2 - sx * sx)) * sx) / nb, 6)
        END AS intercept,
        CASE WHEN (nb * sx2 - sx * sx) * (nb * sy2 - sy * sy) > 0
          THEN round(((nb * sxy - sx * sy) * (nb * sxy - sx * sy)) /
            ((nb * sx2 - sx * sx) * (nb * sy2 - sy * sy)), 6)
        END AS r2
      FROM g ORDER BY event_type""",

    "q82_fk_audit" -> """
      WITH e1 AS (SELECT 'customer.c_nationkey->nation' AS relation,
          (SELECT count(*) FROM customer) AS n_child,
          (SELECT count(*) FROM customer WHERE c_nationkey IS NULL)
            AS n_null,
          count(*) AS n_orphan, count(DISTINCT c_nationkey)
            AS n_orphan_keys,
          CAST(min(c_nationkey) AS BIGINT) AS min_orphan,
          CAST(max(c_nationkey) AS BIGINT) AS max_orphan
        FROM customer WHERE c_nationkey IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)),
      e2 AS (SELECT 'events.user_id->customer',
          (SELECT count(*) FROM events),
          (SELECT count(*) FROM events WHERE user_id IS NULL),
          count(*), count(DISTINCT user_id),
          CAST(min(user_id) AS BIGINT), CAST(max(user_id) AS BIGINT)
        FROM events WHERE user_id IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM customer WHERE c_custkey = user_id)),
      e3 AS (SELECT 'lineitem.l_orderkey->orders',
          (SELECT count(*) FROM lineitem),
          (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL),
          count(*), count(DISTINCT l_orderkey),
          CAST(min(l_orderkey) AS BIGINT), CAST(max(l_orderkey) AS BIGINT)
        FROM lineitem WHERE l_orderkey IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)),
      e4 AS (SELECT 'lineitem.l_partkey->part',
          (SELECT count(*) FROM lineitem),
          (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
          count(*), count(DISTINCT l_partkey),
          CAST(min(l_partkey) AS BIGINT), CAST(max(l_partkey) AS BIGINT)
        FROM lineitem WHERE l_partkey IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM part WHERE p_partkey = l_partkey)),
      e5 AS (SELECT 'lineitem.l_partkey->part_size_gt10',
          (SELECT count(*) FROM lineitem),
          (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
          count(*), count(DISTINCT l_partkey),
          CAST(min(l_partkey) AS BIGINT), CAST(max(l_partkey) AS BIGINT)
        FROM lineitem WHERE l_partkey IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM part WHERE p_size > 10
            AND p_partkey = l_partkey)),
      e6 AS (SELECT 'lineitem.l_suppkey->supplier',
          (SELECT count(*) FROM lineitem),
          (SELECT count(*) FROM lineitem WHERE l_suppkey IS NULL),
          count(*), count(DISTINCT l_suppkey),
          CAST(min(l_suppkey) AS BIGINT), CAST(max(l_suppkey) AS BIGINT)
        FROM lineitem WHERE l_suppkey IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)),
      e7 AS (SELECT 'nation.n_regionkey->region',
          (SELECT count(*) FROM nation),
          (SELECT count(*) FROM nation WHERE n_regionkey IS NULL),
          count(*), count(DISTINCT n_regionkey),
          CAST(min(n_regionkey) AS BIGINT), CAST(max(n_regionkey) AS BIGINT)
        FROM nation WHERE n_regionkey IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM region WHERE r_regionkey = n_regionkey)),
      e8 AS (SELECT 'orders.o_custkey->customer',
          (SELECT count(*) FROM orders),
          (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
          count(*), count(DISTINCT o_custkey),
          CAST(min(o_custkey) AS BIGINT), CAST(max(o_custkey) AS BIGINT)
        FROM orders WHERE o_custkey IS NOT NULL AND NOT EXISTS
          (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
      SELECT * FROM e1 UNION ALL SELECT * FROM e2
      UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4
      UNION ALL SELECT * FROM e5 UNION ALL SELECT * FROM e6
      UNION ALL SELECT * FROM e7 UNION ALL SELECT * FROM e8
      ORDER BY relation""",

    "q83_acf" -> """
      WITH daily AS (SELECT
          datediff('day', DATE '1970-01-01',
            CAST(date_trunc('day', ts) AS DATE)) AS x,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
        FROM events GROUP BY date_trunc('day', ts)),
      lg AS (SELECT unnest(generate_series(1, 7)) AS lag),
      g AS (SELECT lag, count(*) AS nb,
          CAST(sum(a.y) AS DOUBLE) AS sx, CAST(sum(b.y) AS DOUBLE) AS sy,
          CAST(sum(a.y * b.y) AS DOUBLE) AS sxy,
          CAST(sum(a.y * a.y) AS DOUBLE) AS sx2,
          CAST(sum(b.y * b.y) AS DOUBLE) AS sy2
        FROM lg, daily a, daily b WHERE a.x + lag = b.x
        GROUP BY 1)
      SELECT CAST(lag AS INT) AS lag, CAST(nb AS BIGINT) AS n_pairs,
        CASE WHEN (nb * sx2 - sx * sx) * (nb * sy2 - sy * sy) > 0
          THEN round((nb * sxy - sx * sy) /
            sqrt((nb * sx2 - sx * sx) * (nb * sy2 - sy * sy)), 6)
        END AS acf
      FROM g ORDER BY lag""",

    "q84_decile_lift" -> """
      WITH spend AS (SELECT c_mktsegment, c_custkey,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
            AS spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      d AS (SELECT *, ntile(10) OVER (PARTITION BY c_mktsegment
          ORDER BY spend DESC, c_custkey) AS decile FROM spend),
      bd AS (SELECT c_mktsegment, decile, count(*) AS n_customers,
          CAST(sum(spend) AS DECIMAL(18,2)) AS revenue
        FROM d GROUP BY 1, 2),
      x AS (SELECT *,
          CAST(sum(revenue) OVER (PARTITION BY c_mktsegment)
            AS DECIMAL(18,2)) AS seg_rev,
          sum(n_customers) OVER (PARTITION BY c_mktsegment) AS seg_n,
          CAST(sum(revenue) OVER (PARTITION BY c_mktsegment
            ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND
            CURRENT ROW) AS DECIMAL(18,2)) AS cum_rev
        FROM bd)
      SELECT c_mktsegment, CAST(decile AS INT) AS decile, n_customers,
        CAST(revenue AS DOUBLE) AS revenue,
        round(CAST(revenue AS DOUBLE) / seg_rev, 6) AS share,
        round(CAST(cum_rev AS DOUBLE) / seg_rev, 6) AS cum_share,
        round((CAST(revenue AS DOUBLE) / seg_rev) /
          (CAST(n_customers AS DOUBLE) / seg_n), 6) AS lift
      FROM x ORDER BY c_mktsegment, decile""",

    "s27_range_search" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      q AS (SELECT * FROM n WHERE vec_id % 100 = 0)
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
      FROM q, n c WHERE c.vec_id != q.vec_id
        AND round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) >= 0.25
      ORDER BY query_id, neighbor_id""",

    "s28_knn_classify" -> """
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                 FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm
            FROM e),
      q AS (SELECT * FROM n WHERE vec_id % 50 = 0),
      s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          c.label AS nlabel,
          round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM q, n c WHERE c.vec_id != q.vec_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id) AS rk FROM s),
      v AS (SELECT query_id, nlabel, count(*) AS n_votes FROM r
        WHERE rk <= 10 GROUP BY 1, 2),
      p AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY n_votes DESC, nlabel) AS pr FROM v)
      SELECT query_id, nlabel AS pred_label, n_votes,
        round(CAST(n_votes AS DOUBLE) / 10.0, 6) AS vote_share
      FROM p WHERE pr = 1 ORDER BY query_id""",

    "g11_source_conductance" -> s"""
      WITH ${NorthStar.MinhashCtes},
      f AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      ed AS (SELECT f.a, f.b, da.source AS sa, db.source AS sb
        FROM f JOIN documents da ON f.a = da.doc_id
               JOIN documents db ON f.b = db.doc_id),
      m AS (SELECT count(*) AS m_edges FROM ed),
      intra AS (SELECT sa AS source, count(*) AS intra_edges FROM ed
        WHERE sa = sb GROUP BY 1),
      cut AS (SELECT source, count(*) AS cut_edges FROM (
          SELECT sa AS source FROM ed WHERE sa <> sb
          UNION ALL SELECT sb FROM ed WHERE sa <> sb) GROUP BY 1),
      j AS (SELECT coalesce(intra.source, cut.source) AS source,
          coalesce(intra_edges, 0) AS intra_edges,
          coalesce(cut_edges, 0) AS cut_edges
        FROM intra FULL OUTER JOIN cut ON intra.source = cut.source)
      SELECT source, intra_edges, cut_edges,
        2 * intra_edges + cut_edges AS vol,
        CASE WHEN least(2 * intra_edges + cut_edges,
            2 * m_edges - (2 * intra_edges + cut_edges)) > 0
          THEN round(CAST(cut_edges AS DOUBLE) /
            least(2 * intra_edges + cut_edges,
              2 * m_edges - (2 * intra_edges + cut_edges)), 6)
        END AS conductance
      FROM j, m ORDER BY source""",

    "k12_watermark_sizing" -> s"""
      WITH r AS (${KafkaParity.replaySql}),
      lt AS (SELECT "partition",
          epoch_us(max("timestamp") OVER (PARTITION BY "partition"
            ORDER BY "offset"
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) -
          epoch_us("timestamp") AS late_us
        FROM r)
      SELECT "partition", count(*) AS n,
        round(quantile_cont(late_us, 0.5), 6) AS p50_us,
        round(quantile_cont(late_us, 0.95), 6) AS p95_us,
        round(quantile_cont(late_us, 0.99), 6) AS p99_us,
        CAST(max(late_us) AS BIGINT) AS max_us
      FROM lt GROUP BY 1 ORDER BY 1""",

    "q85_attribution" -> """
      WITH dd AS (SELECT user_id, ts, event_type, row_number() OVER (
          PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type IN ('click', 'view', 'signup')),
      touch AS (SELECT user_id AS t_user, ts AS t_ts,
          event_type AS touch_type FROM dd WHERE rn = 1),
      conv AS (SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'),
      j AS (SELECT conv.value, touch.touch_type
        FROM conv ASOF LEFT JOIN touch
          ON conv.user_id = touch.t_user AND conv.ts >= touch.t_ts)
      SELECT coalesce(touch_type, 'unattributed') AS channel,
        count(*) AS n_conversions,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
          AS DOUBLE) AS revenue
      FROM j GROUP BY 1 ORDER BY 1""",

    "q86_rfm_segments" -> """
      WITH maxd AS (SELECT max(o_orderdate) AS maxd FROM orders),
      base AS (SELECT c_mktsegment, c_custkey,
          max(o_orderdate) AS last_order, count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
            AS monetary
        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
      wd AS (SELECT *, datediff('day', CAST(last_order AS DATE),
          CAST(maxd AS DATE)) AS recency_days FROM base, maxd),
      coded AS (SELECT c_mktsegment, monetary,
          ntile(5) OVER (PARTITION BY c_mktsegment
            ORDER BY recency_days ASC, c_custkey ASC) AS rq,
          ntile(5) OVER (PARTITION BY c_mktsegment
            ORDER BY n_orders DESC, c_custkey ASC) AS fq,
          ntile(5) OVER (PARTITION BY c_mktsegment
            ORDER BY monetary DESC, c_custkey ASC) AS mq
        FROM wd)
      SELECT c_mktsegment, CAST(rq AS VARCHAR) || CAST(fq AS VARCHAR) ||
          CAST(mq AS VARCHAR) AS rfm_code,
        count(*) AS n_customers,
        CAST(CAST(sum(monetary) AS DECIMAL(18,2)) AS DOUBLE)
          AS total_monetary,
        round(CAST(sum(monetary) AS DOUBLE) / count(*), 6) AS avg_monetary
      FROM coded GROUP BY 1, 2 ORDER BY 1, 2""",

    "q87_audience_overlap" -> """
      WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
      sz AS (SELECT event_type, count(*) AS n_users FROM tu GROUP BY 1),
      ix AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          count(*) AS n_inter
        FROM tu a JOIN tu b ON a.user_id = b.user_id
          AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, n_inter, sa.n_users AS na, sb.n_users AS nb,
        round(CAST(n_inter AS DOUBLE) /
          (sa.n_users + sb.n_users - n_inter), 6) AS jaccard,
        round(CAST(n_inter AS DOUBLE) /
          least(sa.n_users, sb.n_users), 6) AS overlap_coef,
        round(CAST(n_inter AS DOUBLE) /
          sqrt(CAST(sa.n_users AS DOUBLE) * sb.n_users), 6) AS cosine
      FROM ix JOIN sz sa ON ix.type_a = sa.event_type
        JOIN sz sb ON ix.type_b = sb.event_type
      ORDER BY type_a, type_b""",

    "g12_clustering_coeff" -> s"""
      WITH ${NorthStar.MinhashCtes},
      f AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      und AS (SELECT a AS v, b AS w FROM f UNION ALL SELECT b, a FROM f),
      dg AS (SELECT v, count(*) AS degree FROM und GROUP BY 1),
      wg AS (SELECT u1.v, u1.w AS x, u2.w AS y FROM und u1 JOIN und u2
        ON u1.v = u2.v AND u1.w < u2.w),
      tr AS (SELECT wg.v, count(*) AS n_triangles FROM wg
        JOIN f ON wg.x = f.a AND wg.y = f.b GROUP BY 1)
      SELECT dg.v AS doc_id, degree,
        coalesce(n_triangles, 0) AS n_triangles,
        CASE WHEN degree >= 2 THEN round(
          CAST(2 * coalesce(n_triangles, 0) AS DOUBLE) /
            (degree * (degree - 1)), 6)
        END AS clustering_coef
      FROM dg LEFT JOIN tr ON dg.v = tr.v ORDER BY doc_id""",

    "t45_vocab_coverage" -> raw"""
      WITH tm AS (SELECT lang, unnest(list_filter(
          string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        FROM documents),
      tf AS (SELECT lang, term, count(*) AS f FROM tm GROUP BY 1, 2),
      tot AS (SELECT lang, CAST(sum(f) AS BIGINT) AS total_tokens,
          count(*) AS n_terms FROM tf GROUP BY 1),
      rk AS (SELECT lang, f, row_number() OVER (PARTITION BY lang
          ORDER BY f DESC, term) AS rk FROM tf),
      ct AS (SELECT unnest([10, 100, 1000]) AS cutoff),
      cv AS (SELECT lang, cutoff, CAST(sum(f) AS BIGINT) AS covered_tokens
        FROM rk, ct WHERE rk <= cutoff GROUP BY 1, 2)
      SELECT cv.lang, CAST(cutoff AS INT) AS cutoff, covered_tokens,
        total_tokens, n_terms,
        round(CAST(covered_tokens AS DOUBLE) / total_tokens, 6) AS coverage
      FROM cv JOIN tot ON cv.lang = tot.lang ORDER BY 1, 2""",

    "d36_dup_inflation" -> s"""
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
      dr AS (SELECT doc_id FROM cl WHERE doc_id <> cluster_id),
      j AS (SELECT d.source, d.n_chars, (dr.doc_id IS NOT NULL) AS dropped
        FROM documents d LEFT JOIN dr ON d.doc_id = dr.doc_id)
      SELECT source, count(*) AS n_docs,
        count(*) FILTER (WHERE dropped) AS n_dropped,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(coalesce(sum(n_chars) FILTER (WHERE dropped), 0) AS BIGINT)
          AS wasted_chars,
        CASE WHEN sum(n_chars) -
            coalesce(sum(n_chars) FILTER (WHERE dropped), 0) > 0
          THEN round(CAST(sum(n_chars) AS DOUBLE) / (sum(n_chars) -
            coalesce(sum(n_chars) FILTER (WHERE dropped), 0)), 6)
        END AS inflation
      FROM j GROUP BY 1 ORDER BY 1""",

    "s29_rocchio" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      q AS (SELECT * FROM n WHERE vec_id % 100 = 0),
      s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          c.v AS nv,
          round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM q, n c WHERE c.vec_id != q.vec_id),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id) AS rk FROM s),
      fb AS (SELECT query_id,
          list_reduce(list(nv ORDER BY rk),
            (a, b) -> list_transform(range(1, len(a) + 1),
              i -> a[i] + b[i])) AS acc,
          count(*) AS k FROM r WHERE rk <= 10 GROUP BY query_id),
      p AS (SELECT f.query_id, list_transform(range(1, len(q.v) + 1),
            i -> 1.0 * q.v[i] + 0.5 * f.acc[i] / f.k) AS qp
        FROM fb f JOIN q ON f.query_id = q.vec_id),
      pn AS (SELECT query_id, qp, sqrt(list_dot_product(qp, qp)) AS np
        FROM p),
      sc AS (SELECT pn.query_id, c.vec_id AS neighbor_id,
          round(list_dot_product(pn.qp, c.v) / (pn.np * c.nrm), 6)
            AS cosine
        FROM pn, n c WHERE c.vec_id != pn.query_id),
      rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, neighbor_id) AS "rank" FROM sc)
      SELECT query_id, neighbor_id, cosine, CAST("rank" AS INT) AS "rank"
      FROM rr WHERE "rank" <= 5 ORDER BY query_id, "rank"""")
}
