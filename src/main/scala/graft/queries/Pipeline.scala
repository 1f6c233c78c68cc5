package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CrossHash._

/** Training-data pipeline queries beyond the dedup/search cores: TF-IDF
  * term scoring, deterministic hash sampling, train/val/test splitting,
  * and per-label embedding centroids.
  *
  * Sampling/splitting use the cross-engine md5 hash instead of RNG — at
  * 100 TB a sample must be reproducible across reruns and engines, which
  * `rand()` cannot give; hash-of-content sharding is the standard answer.
  * Centroid sums fold over per-key vec_id-sorted lists so the double
  * addition order is fixed (bit-reproducible); swap for a tree/Kahan sum
  * in production if bit-reproducibility can be relaxed.
  */
object Pipeline {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TF-IDF: the canonical explode→agg→join shuffle pipeline. df-counts
    // broadcast back onto tf pairs; top-5 terms per doc.
    "t05_tfidf" -> { (s, dir) =>
      val d = docs(s, dir)
      val tok = d.select(col("doc_id"),
        explode(split(col("text"), "\\s+")).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dft = tok.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val nDf = d.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(dft), "term")
        .crossJoin(broadcast(nDf))
        .withColumn("score", round(col("tf") *
          log((col("n_docs").cast("double") + lit(1.0)) /
            (col("df").cast("double") + lit(1.0))), 6))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("doc_id"), col("term"), col("score"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    },

    // Deterministic 10% content-hash sample per source.
    "t06_hash_sample" -> { (s, dir) =>
      docs(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          count(when(md5Long(col("text")) % 100 < 10, 1)).as("n_sampled"))
        .orderBy(col("source"))
    },

    // Stratified deterministic sampling: per-(lang, source) stratum rates —
    // the shape a data-mixture pipeline uses to rebalance sources. Rates
    // come from a broadcast map expression (map lookup per row, map-only);
    // membership is the same content-hash test as t06 so the sample is
    // engine- and rerun-reproducible.
    "t10_stratified_sample" -> { (s, dir) =>
      val rate = coalesce(
        map(lit("src0"), lit(5), lit("src1"), lit(20), lit("src2"), lit(50))
          (col("source")),
        lit(10))
      docs(s, dir)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_total"),
          count(when(md5Long(concat(lit("strat:"), col("text"))) % 100
            < rate, 1)).as("n_sampled"))
        .orderBy(col("lang"), col("source"))
    },

    // Temperature-based domain mixture sampling (alpha = 0.5): rates are
    // COMPUTED from corpus stats (p_d ∝ sqrt(n_d), budget-scaled), not
    // supplied — the multinomial rebalancing an LLM data-mix uses. The
    // fixture's sources are uniform, so the query derives a skewed
    // 70/20/10 domain from doc_id to actually exercise the upweighting.
    "t12_mixture_sample" -> { (s, dir) =>
      val dd = docs(s, dir).withColumn("domain",
        when(col("doc_id") % 10 < 7, "web")
          .when(col("doc_id") % 10 < 9, "books").otherwise("code"))
      graft.operators.Sampling.temperatureMixture(dd, "domain", 200L)
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_total"),
          count(when(col("keep"), 1)).as("n_sampled"),
          first(col("sample_rate")).as("sample_rate"))
        .orderBy(col("domain"))
    },

    // Reproducible 80/10/10 train/val/test assignment by content hash.
    "d07_split_assign" -> { (s, dir) =>
      val h = md5Long(concat(lit("split:"), col("text"))) % 100
      docs(s, dir)
        .withColumn("split",
          when(h < 80, "train").when(h < 90, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("split"))
    },

    // Sequence packing: two-level prefix-sum scan (range-partitioned
    // block partials, a window over the block SUMMARY, broadcast join
    // back) — the scalable form of the global running sum a packing
    // writer needs. 8 blocks exercise the multi-block path even at
    // sf0.01; the result is numBlocks-invariant (long addition is
    // associative), which is exactly what the single-running-sum oracle
    // certifies.
    "t17_sequence_pack" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      graft.operators.Packing
        .packSequences(d, "doc_id", "n_tokens", seqLen = 512, numBlocks = 8)
        .orderBy(col("doc_id"))
    },

    // Corpus-level repeated n-gram report: which 5-grams appear in more
    // than one document (the "hot phrase" forensic behind span dedup).
    // Shingles are per-doc distinct already, so n_docs is a plain count;
    // partial agg + TakeOrderedAndProject — no global window, no shuffle
    // beyond the one gram aggregation.
    "t18_repeated_ngrams" -> { (s, dir) =>
      val grams = docs(s, dir).select(
        explode(graft.operators.Dedup.shingles(col("text"), 5)).as("gram"))
      val top = grams.groupBy(col("gram")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1)
        .orderBy(col("n_docs").desc, col("gram"))
        .limit(20)
      // rank assigned AFTER the top-k cut: the un-partitioned window only
      // ever sees the 20 surviving rows.
      top.withColumn("rank", row_number().over(
          Window.orderBy(col("n_docs").desc, col("gram"))))
        .orderBy(col("rank"))
    },

    // Reproducible global shuffle for training-data ordering: content-hash
    // shard + within-shard rank define a deterministic pseudo-random total
    // order (what orderBy(rand()) cannot give) — nShards independent sort
    // tasks, no global sort.
    "t21_shard_order" -> { (s, dir) =>
      graft.operators.Sampling.shardedOrder(docs(s, dir), nShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    },

    // Exact-token-budget sampler: one pick per 500 tokens of cumulative
    // corpus, probability proportional to size, no RNG — the prefix-sum
    // line is the two-level range scan, never a global window.
    "t36_systematic_sample" -> { (s, dir) =>
      val w = docs(s, dir).select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      graft.operators.Sampling
        .systematicSample(w, "doc_id", "n_tokens", stride = 500L,
          numBlocks = 32)
        .select(col("doc_id"), col("n_tokens"), col("cum_start"),
          col("n_picks"))
        .orderBy(col("doc_id"))
    },

    // Per-label embedding centroids: posexplode → two-stage chunked ordered
    // fold per (label, idx) (Similarity.chunkedOrderedSum) — fixed addition
    // tree, so bit-reproducible AND bounded-buffer: a label owning 90% of
    // the corpus holds max(chunk, n/chunk) doubles per buffer instead of n.
    // Output is scalar rows (label, idx, mean, n_vectors) — one per
    // centroid component — so the driver's hash compare can certify it
    // (array columns can't be hashed by its pandas sort).
    "s05_label_centroids" -> { (s, dir) =>
      val exploded = Tables.load(s, dir, "embeddings")
        .select(col("label"), col("vec_id"),
          posexplode(col("embedding").cast("array<double>"))
            .as(Seq("idx", "comp")))
      graft.operators.Similarity
        .chunkedOrderedSum(exploded, Seq("label", "idx"), "vec_id", "comp",
          chunkSize = 256)
        .select(col("label"), col("idx"),
          (col("s") / col("cnt")).as("mean"), col("cnt").as("n_vectors"))
        .orderBy(col("label"), col("idx"))
    },

    // Mislabeled/noisy-example detection: each label's 3 vectors farthest
    // from its own certified (s05-fold) centroid — broadcast centroids,
    // map-side distances, WindowGroupLimit top-k.
    "s16_centroid_outliers" -> { (s, dir) =>
      graft.operators.Similarity
        .centroidOutliers(Tables.load(s, dir, "embeddings"))
        .select(col("label"), col("id").as("vec_id"), col("d2"), col("rank"))
        .orderBy(col("label"), col("rank"))
    })

  // NOTE: must precede `oracles` — Scala object vals initialize in
  // declaration order and these are used in its interpolations.
  private val H = "('0x' || substr(md5(%s), 1, 15))::BIGINT"
  private def h(x: String) = H.format(x)

  val oracles: Map[String, String] = Map(
    "t05_tfidf" -> raw"""
      WITH tok AS (SELECT doc_id,
          unnest(string_split_regex(text, '\s+')) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents),
      sc AS (SELECT doc_id, tf.term,
          round(tf * ln((CAST(n_docs AS DOUBLE) + 1.0) /
                        (CAST(df AS DOUBLE) + 1.0)), 6) AS score
        FROM tf JOIN dft ON tf.term = dft.term, n),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY score DESC, term) AS "rank" FROM sc)
      SELECT doc_id, term, score, CAST("rank" AS INT) AS "rank" FROM r WHERE "rank" <= 5
      ORDER BY doc_id, "rank"""",

    "t06_hash_sample" -> s"""
      SELECT source, count(*) AS n_total,
        count(CASE WHEN ${h("text")} % 100 < 10 THEN 1 END) AS n_sampled
      FROM documents GROUP BY source ORDER BY source""",

    "d07_split_assign" -> s"""
      WITH a AS (SELECT doc_id,
          CASE WHEN ${h("'split:' || text")} % 100 < 80 THEN 'train'
               WHEN ${h("'split:' || text")} % 100 < 90 THEN 'val'
               ELSE 'test' END AS split
        FROM documents)
      SELECT split, count(*) AS n, min(doc_id) AS min_doc,
             max(doc_id) AS max_doc
      FROM a GROUP BY split ORDER BY split""",

    "t10_stratified_sample" -> s"""
      SELECT lang, source, count(*) AS n_total,
        count(CASE WHEN ${h("'strat:' || text")} % 100 <
          CASE source WHEN 'src0' THEN 5 WHEN 'src1' THEN 20
                      WHEN 'src2' THEN 50 ELSE 10 END
          THEN 1 END) AS n_sampled
      FROM documents GROUP BY lang, source ORDER BY lang, source""",

    // sqrt is IEEE-correctly-rounded (identical both engines), the
    // cross-domain sum is decimal (order-free), and the rate chain is a
    // fixed sequence of single double ops — so the rates, and therefore
    // every hash-vs-threshold keep decision, match bit-for-bit.
    "t12_mixture_sample" -> s"""
      WITH dd AS (SELECT *, CASE WHEN doc_id % 10 < 7 THEN 'web'
          WHEN doc_id % 10 < 9 THEN 'books' ELSE 'code' END AS domain
        FROM documents),
      st AS (SELECT domain, count(*) AS n FROM dd GROUP BY domain),
      sq AS (SELECT domain, n, CAST(sqrt(n) AS DECIMAL(18,6)) AS sqd
             FROM st),
      tot AS (SELECT sum(sqd) AS t FROM sq),
      rates AS (SELECT domain, n,
          least(CAST(1 AS DOUBLE), CAST(200 AS DOUBLE)
            * (CAST(sqd AS DOUBLE) / CAST(t AS DOUBLE))
            / CAST(n AS DOUBLE)) AS sample_rate FROM sq, tot)
      SELECT d.domain, CAST(r.n AS BIGINT) AS n_total,
        count(CASE WHEN ${h("'mix:' || d.text")} % 1000000
          < CAST(floor(r.sample_rate * 1e6) AS BIGINT) THEN 1 END)
          AS n_sampled,
        r.sample_rate
      FROM dd d JOIN rates r USING (domain)
      GROUP BY d.domain, r.n, r.sample_rate ORDER BY domain""",

    // Single running-sum formulation: certifies the two-level scan is
    // exactly the plain prefix sum. sum() OVER in DuckDB yields HUGEINT —
    // cast back to BIGINT to match Spark's long.
    "t17_sequence_pack" -> raw"""
      WITH d AS (SELECT doc_id,
          CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      p AS (SELECT doc_id, n_tokens,
          CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS start_token FROM d)
      SELECT doc_id, n_tokens, start_token,
        CASE WHEN n_tokens > 0 THEN start_token // 512 END AS first_seq,
        CASE WHEN n_tokens > 0 THEN (start_token + n_tokens - 1) // 512 END
          AS last_seq,
        CASE WHEN n_tokens > 0 THEN (start_token + n_tokens - 1) // 512
             - start_token // 512 + 1 ELSE 0 END AS n_seqs
      FROM p ORDER BY doc_id""",

    "t18_repeated_ngrams" -> raw"""
      WITH wt AS (SELECT doc_id, string_split_regex(text, '\s+') AS w
                  FROM documents),
      sh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 5
          THEN list_transform(generate_series(1, len(w) - 4),
            i -> array_to_string(w[i:i+4], ' '))
          ELSE [array_to_string(w, ' ')] END) AS sh FROM wt),
      g AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
      c AS (SELECT gram, count(*) AS n_docs FROM g
            GROUP BY gram HAVING count(*) > 1),
      r AS (SELECT gram, n_docs, row_number()
          OVER (ORDER BY n_docs DESC, gram) AS "rank" FROM c)
      SELECT gram, n_docs, CAST("rank" AS INT) AS "rank" FROM r
      WHERE "rank" <= 20 ORDER BY "rank"""",

    "t21_shard_order" -> s"""
      WITH a AS (SELECT doc_id, ${h("'shuf:' || text")} AS hh
                 FROM documents)
      SELECT doc_id, CAST(hh % 8 AS INT) AS shard,
        CAST(row_number() OVER (PARTITION BY hh % 8
          ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos
      FROM a ORDER BY shard, pos""",

    "t36_systematic_sample" -> raw"""
      WITH sw AS (SELECT doc_id,
          CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      sc AS (SELECT doc_id, n_tokens,
          CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS cum_start
        FROM sw)
      SELECT doc_id, n_tokens, cum_start,
        CAST((cum_start + n_tokens) // 500 - cum_start // 500 AS BIGINT)
          AS n_picks
      FROM sc
      WHERE (cum_start + n_tokens) // 500 - cum_start // 500 > 0
      ORDER BY doc_id""",

    // Mirrors the Spark two-stage chunk fold (vec_id // 256 grouping) so
    // the certified addition tree is the bounded-buffer one, not the
    // fixture-scale shortcut.
    "s05_label_centroids" -> """
      WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS v
                 FROM embeddings),
      x AS (SELECT label, vec_id, t.i, v[t.i] AS comp
            FROM e, unnest(generate_series(1, len(v))) AS t(i)),
      p AS (SELECT label, i, vec_id // 256 AS chunk,
              list_reduce(list(comp ORDER BY vec_id), (a, b) -> a + b) AS ps,
              count(*) AS cnt
            FROM x GROUP BY label, i, chunk)
      SELECT label, CAST(i - 1 AS INT) AS idx,
             list_reduce(list(ps ORDER BY chunk), (a, b) -> a + b)
               / CAST(sum(cnt) AS BIGINT) AS mean,
             CAST(sum(cnt) AS BIGINT) AS n_vectors
      FROM p GROUP BY label, i ORDER BY label, idx""",

    // Same centroid fold as s05, re-packed to per-label vectors; distance
    // is the index-ordered left fold every vector oracle here uses.
    "s16_centroid_outliers" -> """
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
      sc AS (SELECT e.label, e.vec_id,
          round(list_reduce(list_transform(list_zip(e.v, cv.cv),
            q -> (q[1] - q[2]) * (q[1] - q[2])), (a, b) -> a + b), 6) AS d2
        FROM e JOIN cv USING (label)),
      r AS (SELECT *, row_number() OVER (PARTITION BY label
          ORDER BY d2 DESC, vec_id) AS "rank" FROM sc)
      SELECT label, vec_id, d2, CAST("rank" AS INT) AS "rank" FROM r
      WHERE "rank" <= 3 ORDER BY label, "rank"""")
}
