package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators._
import graft.sources.KafkaSource

/** Round-6 additions: the explicit bloom-prefiltered semi join (the 100 TB
  * probe-side thinning pattern), CCNet-style cross-document line dedup with
  * an oracle-certified rewrite, heuristic code-vs-prose routing, hybrid
  * retrieval fusion (RRF over cosine + MIPS rankings), Markov next-event
  * transitions, deterministic mode / weighted median, by-source modularity
  * of the near-dup graph, an event-time lateness audit on the Kafka replay
  * relation, and the round's capstone: the line-dedup → code-routing →
  * per-source mixture report. Same oracle discipline as [[Extras]]: every
  * double is a closed formula over exact integers/decimals, rounded at 6.
  */
object Extras2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bloom-prefiltered semi join: orders from one customer segment.
    // The bloom pass thins the probe side BEFORE its shuffle (at 100 TB
    // the fact table never shuffles non-matching rows); the exact semi
    // confirm makes the bloom's false positives invisible — which is why
    // the plain IN-subquery oracle certifies it.
    "q75_bloom_semi_join" -> { (s, dir) =>
      val dec2 = DecimalType(18, 2)
      Joins.bloomSemiJoin(
          t(s, dir, "orders"),
          t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING"),
          "o_custkey", "c_custkey", expectedKeys = 1L << 16)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"),
          // exact DECIMAL sum internally; DOUBLE final (driver's hash
          // is type-sensitive and DECIMAL outputs render differently
          // across engines)
          sum(col("o_totalprice").cast(dec2)).cast("double").as("revenue"))
        .orderBy(col("month"))
    },

    // First-order Markov chain over each user's event sequence: transition
    // counts and probabilities between consecutive event types. One
    // user-keyed window (the natural partition unit) + one aggregation.
    "q76_markov_transitions" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tr = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      tr.withColumn("prob", round(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("prev_type"))), 6))
        .orderBy(col("prev_type"), col("next_type"))
    },

    // Deterministic mode + weighted median per event type. Mode: highest
    // count, smallest bucket on ties (never the engine's arbitrary pick).
    // Weighted median: smallest value whose running weight reaches half
    // the total — exact integer weights, integer cross-compare, the value
    // itself flows through untouched (no FP arithmetic to drift).
    "q77_mode_wmedian" -> { (s, dir) =>
      val base = t(s, dir, "events").select(col("event_type"), col("value"),
        col("event_id"), ((col("event_id") % 7) + 1).as("w"),
        floor(col("value")).cast("long").as("bucket"))
      val mode = base.groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("mode_n"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("mode_n").desc, col("bucket"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("bucket").as("mode_bucket"),
          col("mode_n"))
      val cum = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val med = base
        .withColumn("cw", sum(col("w")).over(cum))
        .withColumn("tw",
          sum(col("w")).over(Window.partitionBy(col("event_type"))))
        .filter(col("cw") * 2 >= col("tw"))
        .groupBy(col("event_type"))
        .agg(min(col("value")).as("w_median"))
      val stats = base.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("total_w"))
      stats.join(mode, "event_type").join(med, "event_type")
        .select(col("event_type"), col("n"), col("total_w"),
          col("mode_bucket"), col("mode_n"), col("w_median"))
        .orderBy(col("event_type"))
    },

    // CCNet-style cross-document line dedup (boilerplate removal): the
    // rewrite itself is certified via the md5 of each rebuilt document.
    "t43_line_dedup" -> { (s, dir) =>
      TextAnalysis.lineDedup(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    },

    // Code-vs-prose routing signals, map-only per doc.
    "t44_code_detect" -> { (s, dir) =>
      TextAnalysis.codeSignals(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    },

    // Hybrid retrieval: RRF fusion of the cosine and inner-product
    // rankings over the standard query panel.
    "s26_hybrid_rrf" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.hybridRrf(e, e.filter(col("vec_id") % 100 === 0))
        .orderBy(col("query_id"), col("fused_rank"))
    },

    // Modularity of the near-dup graph under the BY-SOURCE partition: a
    // positive contribution means near-duplication concentrates inside a
    // source; negative means sources plagiarize each other — the
    // cross-source contamination signal. Closed Newman formula per
    // community over exact integer edge/degree counts.
    "g09_source_modularity" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val e = Shared.pairs(s, dir).select(col("a"), col("b"))
      val src = docs.select(col("doc_id"), col("source"))
      val tot = e.agg(count(lit(1)).as("m"))
      val deg = e.select(explode(array(col("a"), col("b"))).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
        .join(src, "doc_id")
        .groupBy(col("source"))
        .agg(sum(col("deg")).as("d_sum"), count(lit(1)).as("n_nodes"))
      val within = e
        .join(src.select(col("doc_id").as("a"), col("source").as("sa")), "a")
        .join(src.select(col("doc_id").as("b"), col("source").as("sb")), "b")
        .filter(col("sa") === col("sb"))
        .groupBy(col("sa").as("source")).agg(count(lit(1)).as("e_within"))
      val dd = col("d_sum").cast("double") / (col("m") * 2).cast("double")
      deg.join(within, Seq("source"), "left")
        .crossJoin(broadcast(tot))
        .select(col("source"), col("n_nodes"), col("d_sum"),
          coalesce(col("e_within"), lit(0L)).as("e_within"), col("m"))
        .withColumn("q_contrib", round(
          col("e_within").cast("double") / col("m") - dd * dd, 6))
        .orderBy(col("source"))
    },

    // Event-time lateness audit over the replay relation: how out-of-order
    // each partition's stream is (running-max event time vs the record's
    // own) — the measurement that sizes a streaming watermark. One
    // partition-keyed window + one aggregation, no global sort.
    "k10_lateness_audit" -> { (s, dir) =>
      val w = Window.partitionBy(col("partition")).orderBy(col("offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      KafkaSource.replay(t(s, dir, "events"))
        // NTZ→LTZ is value-preserving under the UTC session and makes
        // unix_micros applicable regardless of which timestamp flavor the
        // fixture footer produced.
        .select(col("partition"), col("offset"),
          col("timestamp").cast("timestamp").as("timestamp"))
        .withColumn("late_us",
          unix_micros(max(col("timestamp")).over(w)) -
            unix_micros(col("timestamp")))
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n"),
          count(when(col("late_us") > 0, 1)).as("n_late"),
          max(col("late_us")).as("max_late_us"),
          round(sum(col("late_us")).cast("double") / count(lit(1)), 6)
            .as("mean_late_us"))
        .orderBy(col("partition"))
    },

    // Round-6 capstone: line-dedup → code routing → per-source mixture
    // report. A document survives if it is not code-routed and keeps at
    // least 60% of its char mass after boilerplate-line removal (exact
    // integer cross-compare). One oracle certifies the composition.
    "d34_mixture_report" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val ld = TextAnalysis.lineDedup(docs)
      val cd = TextAnalysis.codeSignals(docs)
        .select(col("doc_id"), col("is_code"))
      val survivor = (!col("is_code")) &&
        (col("kept_chars") * 10 >= col("total_chars") * 6)
      ld.join(cd, "doc_id")
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .withColumn("survivor", survivor)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("is_code"), 1)).as("n_code"),
          count(when(col("survivor"), 1)).as("n_survivors"),
          sum(col("kept_chars")).as("kept_chars"),
          sum(col("total_chars")).as("total_chars"))
        .withColumn("retained_ratio",
          when(col("total_chars") > 0,
            round(col("kept_chars").cast("double") / col("total_chars"), 6)))
        .orderBy(col("source"))
    },

    // Calendar gap-fill: the daily activity series per event type with
    // missing days zero-filled from a generated date spine — the scaffold
    // every downstream time-series model assumes. The spine is
    // bounds-derived (2 tiny aggregates) and broadcast; the big side is
    // touched once for the daily rollup.
    "q78_gap_fill" -> { (s, dir) =>
      val dec2 = DecimalType(18, 2)
      val ev = t(s, dir, "events")
      val daily = ev
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec2)).cast(dec2).as("v"))
      val days = ev
        .agg(date_trunc("day", min(col("ts"))).as("mn"),
          date_trunc("day", max(col("ts"))).as("mx"))
        .select(explode(sequence(col("mn"), col("mx"),
          expr("interval 1 day"))).as("day"))
      ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(days))
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          // DOUBLE final over the exact DECIMAL daily sum (type-stable
          // vs the driver's hash)
          coalesce(col("v").cast("double"), lit(0.0)).as("v"))
        .orderBy(col("event_type"), col("day"))
    },

    // Week-over-week percent change + share-of-total per event type:
    // exact DECIMAL weekly sums, the ratios as closed double formulas.
    // (Weekly, not monthly: the fixture spans ~1 month, so a monthly
    // grain would never exercise the lag.)
    "q79_pct_change" -> { (s, dir) =>
      val dec2 = DecimalType(18, 2)
      val m = t(s, dir, "events")
        .groupBy(col("event_type"),
          date_trunc("week", col("ts")).as("week"))
        .agg(sum(col("value").cast(dec2)).cast(dec2).as("v"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
      m.withColumn("prev", lag(col("v"), 1).over(w))
        .withColumn("wow_pct",
          when(col("prev").isNotNull && col("prev") =!= 0,
            round(col("v").cast("double") / col("prev").cast("double") -
              lit(1.0), 6)))
        .withColumn("share", round(col("v").cast("double") /
          sum(col("v")).over(Window.partitionBy(col("event_type")))
            .cast("double"), 6))
        // DOUBLE finals over the exact DECIMAL weekly sums (type-stable
        // vs the driver's hash); ratios above already computed on the
        // exact decimals
        .withColumn("v", col("v").cast("double"))
        .withColumn("prev", col("prev").cast("double"))
        .orderBy(col("event_type"), col("week"))
    },

    // MinHash threshold sweep: pair counts per signature-agreement level
    // with a cumulative at-least curve — the tuning report that says what
    // moving the near-dup threshold would cost/admit, from ONE pass over
    // the certified pair table.
    "d35_threshold_sweep" -> { (s, dir) =>
      val w = Window.orderBy(col("n_eq").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Shared.pairs(s, dir)
        .groupBy(col("n_eq")).agg(count(lit(1)).as("n_pairs"))
        .withColumn("n_pairs_at_least", sum(col("n_pairs")).over(w))
        .withColumn("threshold_jaccard",
          round(col("n_eq").cast("double") / 16, 6))
        .orderBy(col("n_eq"))
    },

    // Payload nibble entropy: compressibility/corruption proxy per media
    // payload (map-only, fixed-order entropy fold).
    "m15_payload_entropy" -> { (s, dir) =>
      Multimodal.payloadNibbleEntropy(
          t(s, dir, "documents")
            .withColumn("payload", encode(col("text"), "UTF-8")))
        .orderBy(col("doc_id"))
    },

    // Per-key event-time ordering audit: within (partition, key), how
    // often does offset order disagree with event time, and by how much —
    // the per-entity complement of k10's partition-level lateness.
    "k11_order_audit" -> { (s, dir) =>
      val r = KafkaSource.replay(t(s, dir, "events"))
        .select(col("partition"), col("key"), col("offset"),
          col("timestamp").cast("timestamp").as("timestamp"))
      val w = Window.partitionBy(col("partition"), col("key"))
        .orderBy(col("offset"))
      r.withColumn("inv_us",
          unix_micros(lag(col("timestamp"), 1).over(w)) -
            unix_micros(col("timestamp")))
        .groupBy(col("partition"))
        .agg(countDistinct(col("key")).as("n_keys"),
          count(lit(1)).as("n"),
          count(when(col("inv_us") > 0, 1)).as("n_inversions"),
          coalesce(max(when(col("inv_us") > 0, col("inv_us"))), lit(0L))
            .as("max_inversion_us"))
        .orderBy(col("partition"))
    },

    // Degree distribution of the near-dup graph: nodes per degree — the
    // shape check (power law vs template blowup) run before any graph
    // algorithm is trusted.
    "g10_degree_hist" -> { (s, dir) =>
      Shared.pairs(s, dir)
        .select(explode(array(col("a"), col("b"))).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
        .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("deg"))
    })

  /** Shared line-dedup chain (t43, d34): per-line explode with ordinality,
    * the (source, trimmed-line) duplicate directory, and the per-doc
    * summary with the rebuilt-text md5 — mirrors
    * [[graft.operators.TextAnalysis.lineDedup]] exactly.
    */
  private val LineDedupCtes = """
      ll AS (SELECT doc_id, source, t.i AS pos, ln[t.i] AS line,
          trim(ln[t.i]) AS tl
        FROM (SELECT doc_id, source, string_split(text, chr(10)) AS ln
              FROM documents),
          unnest(generate_series(1, len(ln))) AS t(i)),
      ldup AS (SELECT source, tl FROM ll WHERE tl <> ''
        GROUP BY source, tl HAVING count(DISTINCT doc_id) >= 3),
      lm AS (SELECT ll.doc_id, ll.pos, ll.line, (ldup.tl IS NULL) AS keep
        FROM ll LEFT JOIN ldup
          ON ldup.source = ll.source AND ldup.tl = ll.tl),
      ld AS (SELECT doc_id, count(*) AS n_lines,
          count(*) FILTER (WHERE keep) AS n_kept,
          CAST(sum(length(line)) AS BIGINT) AS total_chars,
          CAST(coalesce(sum(length(line)) FILTER (WHERE keep), 0) AS BIGINT)
            AS kept_chars,
          md5(coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)
            ORDER BY pos), '')) AS new_text_md5,
          CASE WHEN sum(length(line)) > 0 THEN
            round(coalesce(sum(length(line)) FILTER (WHERE keep), 0) /
              CAST(sum(length(line)) AS DOUBLE), 6) END AS retained_ratio
        FROM lm GROUP BY doc_id)"""

  /** Shared code-detection chain (t44, d34) — mirrors
    * [[graft.operators.TextAnalysis.codeSignals]].
    */
  private val CodeCtes = raw"""
      craw AS (SELECT doc_id, text, string_split(text, chr(10)) AS ln
        FROM documents),
      cd AS (SELECT doc_id,
          CAST(len(ln) AS BIGINT) AS n_lines,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(list_filter(ln, l -> regexp_matches(l, '^(\t|  )')
            AND trim(l) <> '')) AS BIGINT) AS indent_lines,
          CAST(len(list_filter(ln, l ->
            regexp_matches(trim(l), '[{};]$$'))) AS BIGINT) AS brace_lines,
          CAST(length(text) - length(regexp_replace(text,
            '[\[\](){};=<>]', '', 'g')) AS BIGINT) AS n_symbols,
          CAST(len(regexp_extract_all(text,
            '\b(def|class|import|return|function|var|const|public|void)\b',
            1)) AS BIGINT) AS kw_hits
        FROM craw),
      cflag AS (SELECT *,
          (indent_lines * 5 >= n_lines) OR (brace_lines * 5 >= n_lines)
            OR (n_symbols * 50 >= n_chars AND kw_hits >= 1) AS is_code
        FROM cd)"""

  val oracles: Map[String, String] = Map(

    "q75_bloom_semi_join" -> """
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          AS revenue
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
      GROUP BY 1 ORDER BY 1""",

    "q76_markov_transitions" -> """
      WITH tr AS (SELECT event_type AS prev_type,
          lead(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS next_type
        FROM events),
      c AS (SELECT prev_type, next_type, count(*) AS n FROM tr
        WHERE next_type IS NOT NULL GROUP BY 1, 2)
      SELECT prev_type, next_type, n,
        round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
          AS prob
      FROM c ORDER BY 1, 2""",

    "q77_mode_wmedian" -> """
      WITH base AS (SELECT event_type, value, event_id,
          (event_id % 7) + 1 AS w,
          CAST(floor(value) AS BIGINT) AS bucket FROM events),
      md AS (SELECT event_type, bucket AS mode_bucket, mode_n FROM (
          SELECT event_type, bucket, count(*) AS mode_n, row_number()
            OVER (PARTITION BY event_type ORDER BY count(*) DESC, bucket)
              AS rn
          FROM base GROUP BY event_type, bucket) WHERE rn = 1),
      cm AS (SELECT event_type, value,
          sum(w) OVER (PARTITION BY event_type ORDER BY value, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
          sum(w) OVER (PARTITION BY event_type) AS tw FROM base),
      wm AS (SELECT event_type, min(value) AS w_median FROM cm
        WHERE cw * 2 >= tw GROUP BY 1),
      st AS (SELECT event_type, count(*) AS n,
          CAST(sum(w) AS BIGINT) AS total_w FROM base GROUP BY 1)
      SELECT st.event_type, n, total_w, mode_bucket, mode_n, w_median
      FROM st JOIN md USING (event_type) JOIN wm USING (event_type)
      ORDER BY event_type""",

    "t43_line_dedup" -> s"""
      WITH $LineDedupCtes
      SELECT * FROM ld ORDER BY doc_id""",

    "t44_code_detect" -> s"""
      WITH $CodeCtes
      SELECT doc_id, n_lines, n_chars, indent_lines, brace_lines,
        n_symbols, kw_hits, is_code
      FROM cflag ORDER BY doc_id""",

    "s26_hybrid_rrf" -> """
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
      q AS (SELECT * FROM n WHERE vec_id % 100 = 0),
      cs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM q, n c WHERE c.vec_id != q.vec_id),
      cr AS (SELECT query_id, neighbor_id, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS ra
        FROM cs),
      ca AS (SELECT * FROM cr WHERE ra <= 20),
      ips AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          round(list_dot_product(q.v, c.v), 6) AS ipv
        FROM q, n c WHERE c.vec_id != q.vec_id),
      ir AS (SELECT query_id, neighbor_id, row_number() OVER (
          PARTITION BY query_id ORDER BY ipv DESC, neighbor_id) AS rb
        FROM ips),
      ia AS (SELECT * FROM ir WHERE rb <= 20),
      f AS (SELECT coalesce(ca.query_id, ia.query_id) AS query_id,
          coalesce(ca.neighbor_id, ia.neighbor_id) AS neighbor_id, ra, rb
        FROM ca FULL JOIN ia ON ca.query_id = ia.query_id
          AND ca.neighbor_id = ia.neighbor_id),
      g AS (SELECT query_id, neighbor_id,
          round(coalesce(CAST(1 AS DOUBLE) / (60 + ra), 0) +
                coalesce(CAST(1 AS DOUBLE) / (60 + rb), 0), 6) AS rrf,
          ra, rb FROM f),
      r AS (SELECT *, row_number() OVER (PARTITION BY query_id
          ORDER BY rrf DESC, neighbor_id) AS fr FROM g)
      SELECT query_id, neighbor_id, rrf, CAST(ra AS INT) AS cosine_rank,
        CAST(rb AS INT) AS ip_rank, CAST(fr AS INT) AS fused_rank
      FROM r WHERE fr <= 10 ORDER BY query_id, fr""",

    "g09_source_modularity" -> s"""
      WITH ${NorthStar.MinhashCtes},
      filt AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      tot AS (SELECT count(*) AS m FROM filt),
      dg AS (SELECT doc_id, count(*) AS deg FROM (
          SELECT a AS doc_id FROM filt
          UNION ALL SELECT b FROM filt) GROUP BY 1),
      ds AS (SELECT source, CAST(sum(deg) AS BIGINT) AS d_sum,
          count(*) AS n_nodes
        FROM dg JOIN documents USING (doc_id) GROUP BY 1),
      wi AS (SELECT sa.source AS source, count(*) AS e_within
        FROM filt JOIN documents sa ON sa.doc_id = filt.a
                  JOIN documents sb ON sb.doc_id = filt.b
        WHERE sa.source = sb.source GROUP BY 1)
      SELECT ds.source, n_nodes, d_sum,
        coalesce(e_within, 0) AS e_within, m,
        round(CAST(coalesce(e_within, 0) AS DOUBLE) / m -
          (CAST(d_sum AS DOUBLE) / CAST(m * 2 AS DOUBLE)) *
          (CAST(d_sum AS DOUBLE) / CAST(m * 2 AS DOUBLE)), 6) AS q_contrib
      FROM ds LEFT JOIN wi USING (source), tot ORDER BY ds.source""",

    "k10_lateness_audit" -> s"""
      WITH r AS (${KafkaParity.replaySql}),
      lt AS (SELECT "partition",
          epoch_us(max("timestamp") OVER (PARTITION BY "partition"
            ORDER BY "offset"
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) -
          epoch_us("timestamp") AS late_us
        FROM r)
      SELECT "partition", count(*) AS n,
        count(*) FILTER (WHERE late_us > 0) AS n_late,
        CAST(max(late_us) AS BIGINT) AS max_late_us,
        round(CAST(sum(late_us) AS DOUBLE) / count(*), 6) AS mean_late_us
      FROM lt GROUP BY 1 ORDER BY 1""",

    "d34_mixture_report" -> s"""
      WITH $LineDedupCtes, $CodeCtes,
      j AS (SELECT d.source, ld.kept_chars, ld.total_chars, cflag.is_code,
          (NOT cflag.is_code) AND (ld.kept_chars * 10 >= ld.total_chars * 6)
            AS survivor
        FROM ld JOIN cflag USING (doc_id)
          JOIN documents d USING (doc_id))
      SELECT source, count(*) AS n_docs,
        count(*) FILTER (WHERE is_code) AS n_code,
        count(*) FILTER (WHERE survivor) AS n_survivors,
        CAST(sum(kept_chars) AS BIGINT) AS kept_chars,
        CAST(sum(total_chars) AS BIGINT) AS total_chars,
        CASE WHEN sum(total_chars) > 0 THEN
          round(sum(kept_chars) / CAST(sum(total_chars) AS DOUBLE), 6) END
          AS retained_ratio
      FROM j GROUP BY 1 ORDER BY 1""",

    "q78_gap_fill" -> """
      WITH daily AS (SELECT event_type,
          CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
        FROM events GROUP BY 1, 2),
      b AS (SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS mn,
          CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS mx FROM events),
      days AS (SELECT t.d AS day
        FROM b, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS t(d)),
      ty AS (SELECT DISTINCT event_type FROM events)
      SELECT event_type, day, coalesce(n, 0) AS n,
        coalesce(CAST(v AS DOUBLE), CAST(0 AS DOUBLE)) AS v
      FROM ty CROSS JOIN days LEFT JOIN daily USING (event_type, day)
      ORDER BY 1, 2""",

    "q79_pct_change" -> """
      WITH m AS (SELECT event_type,
          CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
        FROM events GROUP BY 1, 2),
      x AS (SELECT *,
          lag(v, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev,
          sum(v) OVER (PARTITION BY event_type) AS tot FROM m)
      SELECT event_type, week, CAST(v AS DOUBLE) AS v,
        CAST(prev AS DOUBLE) AS prev,
        CASE WHEN prev IS NOT NULL AND prev <> 0 THEN
          round(CAST(v AS DOUBLE) / CAST(prev AS DOUBLE) -
            CAST(1 AS DOUBLE), 6) END AS wow_pct,
        round(CAST(v AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
      FROM x ORDER BY 1, 2""",

    "d35_threshold_sweep" -> s"""
      WITH ${NorthStar.MinhashCtes},
      f AS (SELECT n_eq FROM pairs WHERE n_eq * 100 >= 800),
      g AS (SELECT n_eq, count(*) AS n_pairs FROM f GROUP BY 1)
      SELECT n_eq, n_pairs,
        CAST(sum(n_pairs) OVER (ORDER BY n_eq DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS n_pairs_at_least,
        round(n_eq / CAST(16 AS DOUBLE), 6) AS threshold_jaccard
      FROM g ORDER BY n_eq""",

    "m15_payload_entropy" -> """
      WITH p AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
      c AS (SELECT doc_id, length(hx) AS n,
          list_transform(['0','1','2','3','4','5','6','7','8','9',
            'A','B','C','D','E','F'],
            s -> length(hx) - length(replace(hx, s, ''))) AS cnt
        FROM p)
      SELECT doc_id, CAST(n AS BIGINT) AS n_nibbles,
        CAST(len(list_filter(cnt, c -> c > 0)) AS BIGINT) AS n_distinct,
        CASE WHEN n > 0 THEN round(-list_reduce(
          list_prepend(0.0, list_transform(cnt,
            c -> CASE WHEN c > 0 THEN (CAST(c AS DOUBLE) / n) *
              ln(CAST(c AS DOUBLE) / n) ELSE 0.0 END)),
          (a, b) -> a + b), 6) END AS nibble_entropy
      FROM c ORDER BY doc_id""",

    "k11_order_audit" -> s"""
      WITH r AS (${KafkaParity.replaySql}),
      iv AS (SELECT "partition", "key",
          epoch_us(lag("timestamp", 1) OVER (
            PARTITION BY "partition", "key" ORDER BY "offset")) -
          epoch_us("timestamp") AS inv_us
        FROM r)
      SELECT "partition", count(DISTINCT "key") AS n_keys, count(*) AS n,
        count(*) FILTER (WHERE inv_us > 0) AS n_inversions,
        CAST(coalesce(max(inv_us) FILTER (WHERE inv_us > 0), 0) AS BIGINT)
          AS max_inversion_us
      FROM iv GROUP BY 1 ORDER BY 1""",

    "g10_degree_hist" -> s"""
      WITH ${NorthStar.MinhashCtes},
      f AS (SELECT a, b FROM pairs WHERE n_eq * 100 >= 800),
      dg AS (SELECT doc_id, count(*) AS deg FROM (
          SELECT a AS doc_id FROM f UNION ALL SELECT b FROM f) GROUP BY 1)
      SELECT deg, count(*) AS n_nodes FROM dg GROUP BY 1 ORDER BY 1""")
}
