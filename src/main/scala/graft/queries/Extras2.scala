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
          sum(col("o_totalprice").cast(dec2)).cast(dec2).as("revenue"))
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
      val e = Dedup.minhashPairs(docs).select(col("a"), col("b"))
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
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
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
      FROM j GROUP BY 1 ORDER BY 1""")
}
