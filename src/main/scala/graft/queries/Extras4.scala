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
    // decimal cross-products (cum*100 <= tot*80) — no double enters the
    // class decision. The global cumulative window runs over the PART
    // dimension (|parts| ~ lineitem/30), aggregated first, so the
    // single-task sort is dimension-sized — the inherent serial step of
    // any Pareto ranking, never applied to the fact table itself.
    "q88_abc_pareto" -> { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(drev(col("l_extendedprice"), col("l_discount"))).as("rev"))
      val wCum = Window.orderBy(col("rev").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      rev
        .withColumn("cum", sum(col("rev")).over(wCum))
        .withColumn("tot", sum(col("rev")).over(wAll))
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

    // Cluster-density audit of the near-dup graph: per connected
    // component, direct edges vs implied pairs (n·(n-1)/2). A large
    // cluster with low density is the chain-collapse signature —
    // transitive closure glued docs that share no direct near-dup edge,
    // the #1 silent over-deletion risk of keep-one dedup. Composes the
    // certified pair + component chains; the audit itself is two
    // cluster-sized aggregations.
    "d37_cluster_density" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val pairs = Dedup.minhashPairs(d).select(col("a"), col("b"))
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
