package graft

import org.apache.spark.sql.functions._

import graft.queries.{Extras6, KafkaParity}

/** Round-10 gates: the streaming facts the k20/k21/k22 CORRECTNESS rows
  * alone cannot show (multi-batch execution, late drops, state GC on both
  * join sides, cross-batch session merges, crash+restart exactly-once),
  * the RocksDB state-store twin of the k19 multi-batch run, and the g20
  * sketch's calibration against the exact BFS reach counts.
  */
class Round10Spec extends SparkSpec {

  test("k20 stream-stream interval join: watermark advances across >=3 " +
      "micro-batches, late input dropped, state GC'd on BOTH sides") {
    val (res, dataBatches, dropped, removed) =
      Extras6.intervalJoinReplay(spark, sf)
    val pairs = res.count()
    assert(pairs > 0, "join produced no pairs")
    assert(dataBatches >= 3,
      s"expected >= 3 data micro-batches, saw $dataBatches")
    assert(dropped > 0, "no rows were dropped by the watermark — the " +
      "late injection never exercised the input filter")
    assert(removed > 0, "no state rows were evicted")

    // Per-side eviction accounting, from the same replay model the oracle
    // uses (see Extras6.oracles k20) plus two facts K20Probe pinned
    // batch-by-batch: (1) the AvailableNow flush batch DOES run for joins
    // and evicts with the final watermark; (2) a RIGHT input row that is
    // already evictable on arrival (buy_ts < the CURRENT batch's
    // watermark — reachable only by a late-but-not-dropped row, since the
    // late filter lags one batch) is never stored, so it is never counted
    // in numRowsRemoved, while LEFT survivors always store (their state
    // bound view_ts + 48h sits 48h above the late-filter cutoff, so a
    // left survivor is never arrival-evictable). A side's stored rows are
    // removed by termination iff the final watermark passed their state
    // bound (left: view_ts + 48h <= wfinal; right: buy_ts < wfinal). The
    // sum must equal the run's total numRowsRemoved and each side must be
    // nonzero — proof the dual watermark GC'd BOTH join states.
    // (Cross-checked at sf0.001: dropped 0,0,4,3 / updated 100,91,99,89 /
    // removed 0,69,90,104,87 across the 5 batches, all reproduced.)
    spark.read.parquet(s"$sf/events.parquet").createOrReplaceTempView(
      "k20_events")
    val acct = spark.sql("""
      WITH ev AS (SELECT event_id,
          date_trunc('millisecond', cast(ts as timestamp)) AS ts,
          user_id, event_type FROM k20_events
        WHERE event_type IN ('view', 'purchase')),
      bnds AS (SELECT min(unix_micros(ts)) AS mn, max(unix_micros(ts)) AS mx
        FROM ev),
      f AS (SELECT ev.*,
          CASE WHEN event_id % 19 = 0
            THEN least(((unix_micros(ts) - mn) * 4) div (mx - mn + 1) + 2, 3)
            ELSE ((unix_micros(ts) - mn) * 4) div (mx - mn + 1)
          END AS fidx
        FROM ev, bnds),
      l AS (SELECT ts, fidx FROM f WHERE event_type = 'view'),
      r AS (SELECT ts, fidx FROM f WHERE event_type = 'purchase'),
      lm AS (SELECT fidx, max(ts) AS mx FROM l GROUP BY fidx),
      rm AS (SELECT fidx, max(ts) AS mx FROM r GROUP BY fidx),
      wmk AS (SELECT k AS fidx,
          least((SELECT max(mx) FROM lm WHERE lm.fidx <= k - 2),
                (SELECT max(mx) FROM rm WHERE rm.fidx <= k - 2))
            - INTERVAL 24 HOUR AS wprev,
          least((SELECT max(mx) FROM lm WHERE lm.fidx <= k - 1),
                (SELECT max(mx) FROM rm WHERE rm.fidx <= k - 1))
            - INTERVAL 24 HOUR AS wcur
        FROM (SELECT explode(sequence(0, 3)) AS k)),
      fin AS (SELECT least((SELECT max(mx) FROM lm),
                           (SELECT max(mx) FROM rm))
            - INTERVAL 24 HOUR AS wfinal)
      SELECT
        (SELECT count(*) FROM l JOIN wmk USING (fidx), fin
          WHERE (wprev IS NULL OR l.ts >= wprev)
            AND l.ts + INTERVAL 48 HOUR <= wfinal) AS left_removed,
        (SELECT count(*) FROM r JOIN wmk USING (fidx), fin
          WHERE (wprev IS NULL OR r.ts >= wprev)
            AND (wcur IS NULL OR r.ts >= wcur)
            AND r.ts < wfinal) AS right_removed
      """).collect()(0)
    val (lExp, rExp) = (acct.getLong(0), acct.getLong(1))
    assert(lExp > 0 && rExp > 0,
      s"replay model expects evictions on both sides, got ($lExp, $rExp)")
    assert(removed === lExp + rExp,
      s"numRowsRemoved $removed != modeled left $lExp + right $rExp")
  }

  test("k21 streaming session windows: >=3 micro-batches, sessions merge " +
      "ACROSS batches in the state store, state evicted on emission") {
    val (res, dataBatches, removed) = Extras6.sessionReplay(spark, sf)
    val sessions = res.collect()
    assert(sessions.nonEmpty)
    assert(dataBatches >= 3,
      s"expected >= 3 data micro-batches, saw $dataBatches")
    assert(removed > 0, "no session state was evicted — append emission " +
      "never closed a session")

    // Cross-batch merge: at least one EMITTED session must contain events
    // from >= 2 quartile files — its partial session sat in the state
    // store at a batch boundary and a later micro-batch merged into it.
    spark.read.parquet(s"$sf/events.parquet").createOrReplaceTempView(
      "k21_events")
    val spans = spark.sql("""
      WITH ev AS (SELECT user_id,
          date_trunc('millisecond', cast(ts as timestamp)) AS ts
        FROM k21_events),
      bnds AS (SELECT min(unix_micros(ts)) AS mn, max(unix_micros(ts)) AS mx
        FROM ev),
      f AS (SELECT ev.*,
          ((unix_micros(ts) - mn) * 4) div (mx - mn + 1) AS fidx
        FROM ev, bnds),
      s AS (SELECT user_id, ts, fidx,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 IS NULL
               OR ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 + INTERVAL 12 HOUR
          THEN 1 ELSE 0 END AS brk
        FROM f),
      g AS (SELECT user_id, ts, fidx,
          sum(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM s)
      SELECT user_id, min(ts) AS session_start,
        count(distinct fidx) AS n_files
      FROM g GROUP BY user_id, sid""")
    val merged = spans.filter(col("n_files") >= 2)
      .join(res, Seq("user_id", "session_start"), "left_semi").count()
    assert(merged > 0,
      "no emitted session spans two micro-batch files — the replay " +
        "never exercised cross-batch session merging")
  }

  test("k22 exactly-once idempotent sink: injected crash after the batch-2 " +
      "write, restart from checkpoint, zero dupes / zero loss") {
    val (res, firstCrashed, batchDirs) =
      Extras6.idempotentSinkReplay(spark, sf)
    assert(firstCrashed, "the injected crash did not fire")
    assert(batchDirs === 4, s"expected 4 batchId-keyed dirs, got $batchDirs")
    val got = res.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("event_id")).as("n_ids"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .orderBy(col("event_type")).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === want.toSeq,
      "sink content diverged from the batch aggregation")
    got.foreach { case (t, n, ids, _) =>
      assert(n === ids, s"duplicate event_ids for $t after restart")
    }
  }

  test("k19 multi-batch replay is bit-identical under the RocksDB state " +
      "store provider, and the provider genuinely engages (VERDICT r9 " +
      "item 5)") {
    val hdfs = KafkaParity.multiBatchReplay(spark, sf)
    val hdfsRows = hdfs._1.collect().map(_.toSeq)
    assert(hdfs._2 >= 3 && hdfs._3 > 0)

    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryProgressEvent): Unit =
        e.progress.stateOperators.foreach(_.customMetrics.keySet()
          .forEach(k => { seen.add(k); () }))
      override def onQueryTerminated(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    spark.streams.addListener(listener)
    try {
      val rocks = KafkaParity.multiBatchReplay(spark, sf)
      assert(rocks._2 >= 3 && rocks._3 === hdfs._3,
        "late-drop counts diverged across providers")
      assert(rocks._1.collect().map(_.toSeq).toSeq === hdfsRows.toSeq,
        "windowed counts diverged across state store providers")
      import scala.jdk.CollectionConverters._
      assert(seen.asScala.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb custom metrics in progress events — provider did " +
          s"not engage (saw: ${seen.asScala.toSeq.sorted.take(10)})")
    } finally {
      spark.streams.removeListener(listener)
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("g20 reach sketch calibrates against the exact BFS counts " +
      "(ball = 1 + cumulative kHopCounts)") {
    val est = SparkEntry.queries("g20_reach_sketch")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val exact = graft.queries.Shared.khop3(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).flatMap { case (seed, rows) =>
        val byDist = rows.map(r => r._2 -> r._3).toMap
        (1 to 3).map { d =>
          (seed, d) -> (1L + (1 to d).map(byDist.getOrElse(_, 0L)).sum)
        }
      }
    assert(est.keySet === exact.keySet,
      "sketch and exact profiles cover different (seed, dist) cells")
    val rels = est.map { case (k, v) =>
      math.abs(v - exact(k)).toDouble / exact(k) }
    assert(rels.max < 0.4,
      s"worst sketch error ${rels.max} exceeds 40% (m=64 registers)")
    assert(rels.sum / rels.size < 0.15,
      s"mean sketch error ${rels.sum / rels.size} exceeds 15%")
  }
}
