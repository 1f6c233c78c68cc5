package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.Tables
import graft.sources.KafkaSource

/** Parity queries for the reference's single operator: the `kafka_consumer`
  * streaming scan (reference: src/kafquack_extension.cpp:68-230), exercised
  * through the broker-free [[KafkaSource.replay]] projection of the events
  * fixture (same 7-column shape, same errors-as-data semantics).
  */
object KafkaParity {

  private val propsSchema = StructType(Seq(StructField("k", IntegerType)))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The full 7-column kafka_consumer relation (README.md:13 `SELECT *`).
    "k01_replay_records" -> { (s, dir) =>
      KafkaSource.replay(Tables.load(s, dir, "events"))
        .orderBy(col("offset"))
    },

    // Errors-as-data invariant: value IS NULL XOR error IS NULL
    // (cpp:189-197), plus a JSON decode stage downstream of the scan.
    "k02_decode_errors" -> { (s, dir) =>
      val dec = KafkaSource.withJsonDecoded(
        KafkaSource.replay(Tables.load(s, dir, "events")), propsSchema)
      dec.agg(
        count(lit(1)).as("n_total"),
        count(col("error")).as("n_errors"),
        sum(col("decoded").getField("k")).as("sum_k"),
        count(when(col("value").isNull === col("error").isNull, 1))
          .as("n_invariant_violations"))
    },

    // Per-partition consumption stats — the unit of parallelism Spark's
    // Kafka source reads with (vs the reference's forced single thread,
    // cpp:63-65).
    "k03_partition_stats" -> { (s, dir) =>
      KafkaSource.replay(Tables.load(s, dir, "events"))
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n"),
          min(col("offset")).as("min_offset"),
          max(col("offset")).as("max_offset"),
          count(col("error")).as("n_errors"))
        .orderBy(col("partition"))
    },

    // Log-compaction view: the latest record per (partition, key) with
    // NULL-value tombstones dropped — what a compacted Kafka topic
    // retains (the reference consumes compacted topics like any other;
    // this materializes the compacted STATE relationally). One
    // partition+key window, offset-descending; keep-latest-per-key is
    // the DISTINCT ON parity row (the oracle uses DuckDB's native
    // DISTINCT ON).
    "k07_compacted_view" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("partition"), col("key"))
        .orderBy(col("offset").desc)
      KafkaSource.replay(Tables.load(s, dir, "events"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("value").isNotNull)
        .select(col("partition"), col("key"), col("offset"), col("value"))
        .orderBy(col("partition"), col("key"))
    },

    // Batch offset-continuity audit — the batch twin of
    // StreamOps.detectOffsetGaps: per partition, how many adjacent-offset
    // gaps and how much is missing. One window + one aggregation, both
    // partition-keyed (the natural Kafka parallelism unit; no global
    // sort).
    "k06_offset_audit" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("partition")).orderBy(col("offset"))
      KafkaSource.replay(Tables.load(s, dir, "events"))
        .select(col("partition"), col("offset"))
        .withColumn("gap",
          col("offset") - lag(col("offset"), 1).over(w) - 1)
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n"),
          min(col("offset")).as("min_offset"),
          max(col("offset")).as("max_offset"),
          count(when(col("gap") > 0, 1)).as("n_gaps"),
          coalesce(sum(col("gap")), lit(0L)).as("n_missing"),
          coalesce(max(col("gap")), lit(0L)).as("max_gap"))
        .orderBy(col("partition"))
    },

    // Consumer-lag report — the monitoring query every Kafka deployment
    // runs: per partition, the log-end offset vs the "committed" position
    // (here: the highest offset at least one watermark-interval old —
    // the replay fixture's stand-in for a committed-offsets table) and
    // the resulting lag. Partition-keyed aggregation after one broadcast
    // of the single-row cutoff — no global sort, no window.
    "k08_consumer_lag" -> { (s, dir) =>
      val r = KafkaSource.replay(Tables.load(s, dir, "events"))
      val cut = r.agg(
        (max(col("timestamp")) - expr("INTERVAL 1 HOUR")).as("cut"))
      r.crossJoin(broadcast(cut))
        .groupBy(col("topic"), col("partition"))
        .agg(count(lit(1)).as("n"),
          max(col("offset")).as("end_offset"),
          max(when(col("timestamp") <= col("cut"), col("offset")))
            .as("committed_offset"))
        .withColumn("lag", col("end_offset") - col("committed_offset"))
        .orderBy(col("partition"))
    },

    // Error-burst detection — the alerting query on the decode-error
    // channel: 6-hour windows whose error rate runs at least 1.5x the
    // topic-wide rate, compared in exact integer cross-products (no
    // per-window double division). One windowed aggregation + a
    // broadcast of the single-row overall rate.
    "k09_error_bursts" -> { (s, dir) =>
      val r = KafkaSource.replay(Tables.load(s, dir, "events"))
      val wins = r.groupBy(window(col("timestamp"), "6 hours")("start")
          .as("win_start"))
        .agg(count(lit(1)).as("n"),
          count(col("error")).as("n_errors"))
      val overall = r.agg(count(lit(1)).as("n_total"),
        count(col("error")).as("e_total"))
      wins.crossJoin(broadcast(overall))
        // n_errors/n >= 1.5 * e_total/n_total, cross-multiplied exact
        .filter(col("n_errors") * col("n_total") * 2 >=
          col("e_total") * col("n") * 3)
        .select(col("win_start"), col("n"), col("n_errors"),
          round(col("n_errors") / col("n").cast("double"), 6)
            .as("err_rate"))
        .orderBy(col("win_start"))
    },

    // Partition-pruned scan through the SQL front door: the
    // `partitions => '0,3'` named arg (the connector's `assign` — the one
    // pushdown a Kafka scan CAN do, which the reference declines,
    // cpp:126,226-227) driven end-to-end via spark.sql and certified by
    // an oracle over the restricted relation.
    "k04_partition_pruned" -> { (s, dir) =>
      graft.GraftExtensions.register(s)
      s.conf.set(KafkaSource.ReplayConfKey, dir)
      s.sql("""SELECT * FROM kafka_consumer(
          'localhost:9092', 'events', 'grp', partitions => '0,3')""")
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n"),
          min(col("offset")).as("min_offset"),
          max(col("offset")).as("max_offset"))
        .orderBy(col("partition"))
    },

    // TRUE streaming execution under the oracle gate (VERDICT r7 item 2):
    // the canonical streaming plan — AvailableNow replay of the events
    // fixture → watermarked 5-minute tumbling counts per key → parquet
    // sink — actually runs through MicroBatchExecution (source →
    // state store → append-mode emission), and the files the sink wrote
    // are the query result. Append mode only emits windows the final
    // watermark (max event time − 10 min lateness) has closed, so the
    // batch oracle applies the same cutoff; the fixture replays as ONE
    // micro-batch (single file), so no row is ever late-dropped and the
    // no-data flush batch finalizes everything below the watermark.
    // Deterministic end-to-end — the rare CORRECTNESS row whose Spark
    // side is a real streaming run.
    "k18_streaming_counts" -> { (s, dir) =>
      val out = java.nio.file.Files.createTempDirectory("graft-k18-out")
      val cp = java.nio.file.Files.createTempDirectory("graft-k18-cp")
      try {
        // scale-adaptive state partitioning — see
        // StreamOps.adaptiveStatePartitions
        val q = graft.streaming.StreamOps.withStatePartitions(s,
            graft.streaming.StreamOps.pathBytes(
              java.nio.file.Paths.get(dir, "events.parquet"))) {
          graft.streaming.StreamOps.windowedCounts(
              graft.streaming.StreamOps.replayStream(s, dir))
            .writeStream.format("parquet")
            .option("path", out.toString)
            .option("checkpointLocation", cp.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
        }
        q.awaitTermination()
        // localCheckpoint pins the (window-count-sized) result in session
        // memory so the sink/checkpoint dirs can be deleted immediately —
        // under the 3-pass bench this query used to leave six temp trees
        // per run (ADVICE r8).
        s.read.parquet(out.toString).orderBy(col("bucket"), col("key"))
          .localCheckpoint()
      } finally {
        Shared.deleteTree(out); Shared.deleteTree(cp)
      }
    },

    // MULTI-micro-batch streaming under the oracle gate (VERDICT r8
    // item 1): the events replay split into four time-quartile files —
    // with every 19th offset deterministically delivered two batches
    // late — streamed with maxFilesPerTrigger=1 under AvailableNow, so
    // the watermark genuinely ADVANCES batch-by-batch and late rows are
    // genuinely DROPPED by the state operator (k18's single-batch replay
    // could never exercise either). The oracle replays the same
    // per-batch watermark-cutoff sequence in SQL — including Spark's
    // SPARK-40925 discipline where the late-event filter of batch k uses
    // the PREVIOUS batch's watermark while eviction uses the current
    // one (see the oracle comment) — and a window is emitted iff its
    // end <= the final watermark. StreamingSpec additionally asserts
    // >=3 data micro-batches and a nonzero numRowsDroppedByWatermark
    // from the run's progress events.
    "k19_streaming_multibatch" -> { (s, dir) =>
      multiBatchReplay(s, dir)._1
    },

    // Time-range-pruned scan: `start_ts`/`end_ts` named args — broker
    // timestamp-index offset resolution in production
    // (startingTimestamp/endingTimestamp), the second pushdown the
    // reference declines; inclusive-exclusive range.
    "k05_time_pruned" -> { (s, dir) =>
      graft.GraftExtensions.register(s)
      s.conf.set(KafkaSource.ReplayConfKey, dir)
      s.sql("""SELECT * FROM kafka_consumer(
          'localhost:9092', 'events', 'grp',
          start_ts => '2024-01-05 00:00:00', end_ts => '2024-01-12 00:00:00')""")
        .groupBy(col("partition"))
        .agg(count(lit(1)).as("n"),
          min(col("timestamp")).as("min_ts"),
          max(col("timestamp")).as("max_ts"))
        .orderBy(col("partition"))
    })

  /** k19 core: deterministic 4-file split of the replay relation, one
    * micro-batch per file, watermarked windowed counts into a parquet
    * sink. Returns (result, dataBatches, rowsDroppedByWatermark) so the
    * spec can assert the multi-batch/late-drop facts the CORRECTNESS row
    * alone cannot show.
    *
    * File k holds the rows of time-quartile k — computed in exact BIGINT
    * arithmetic on epoch-micros so the oracle reproduces the assignment
    * bit-for-bit — except rows with offset % 19 == 0, which ship two
    * files later (capped at file 3): genuinely late arrivals once the
    * watermark has advanced past their quartile. Files get strictly
    * increasing mtimes (FileStreamSource orders by modification time), so
    * the batch sequence is the file sequence.
    */
  private[graft] def multiBatchReplay(s: SparkSession, dir: String)
      : (DataFrame, Long, Long) = {
    import java.nio.file.Files
    import java.nio.file.attribute.FileTime
    val src = Files.createTempDirectory("graft-k19-src")
    val out = Files.createTempDirectory("graft-k19-out")
    val cp = Files.createTempDirectory("graft-k19-cp")
    try {
      val r = KafkaSource.replay(Tables.load(s, dir, "events"))
      val outCols = r.columns.map(col)
      // NTZ→LTZ cast is value-preserving under the UTC session, so
      // unix_micros sees the same numbers DuckDB's epoch_us does.
      val b = r.agg(
        min(unix_micros(col("timestamp").cast("timestamp"))).as("mn"),
        max(unix_micros(col("timestamp").cast("timestamp"))).as("mx"))
      val quart = "((unix_micros(cast(`timestamp` as timestamp)) - mn) " +
        "* 4) div (mx - mn + 1)"
      val withF = r.crossJoin(broadcast(b)).withColumn("fidx",
        expr(s"CASE WHEN `offset` % 19 = 0 THEN least($quart + 2, 3) " +
          s"ELSE $quart END"))
      val baseMs = System.currentTimeMillis() - 3600000L
      // ONE scan writes all four slices: repartition by fidx puts each
      // file index in exactly one task, partitionBy(fidx) splits it into
      // one parquet file per fidx=k/ dir (the fidx column moves to the
      // path, so the files hold exactly the 7 replay columns). Four
      // filtered coalesce(1) writes would re-scan the replay 4x.
      val tmp = Files.createTempDirectory("graft-k19-slices")
      try {
        withF.select(outCols :+ col("fidx"): _*)
          .repartition(4, col("fidx"))
          .write.mode("overwrite").partitionBy("fidx").parquet(tmp.toString)
        import scala.jdk.CollectionConverters._
        (0 to 3).foreach { k =>
          val dir = tmp.resolve(s"fidx=$k")
          if (Files.isDirectory(dir)) {
            scala.util.Using.resource(Files.list(dir)) { st =>
              st.iterator().asScala
                .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
            }.headOption.foreach { part =>
              val dest = src.resolve(s"e$k.parquet")
              Files.move(part, dest)
              Files.setLastModifiedTime(dest,
                FileTime.fromMillis(baseMs + k * 10000L))
            }
          }
        }
      } finally Shared.deleteTree(tmp)
      val glob = s"$src/e*.parquet"
      val schema = s.read.parquet(glob).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(glob)
      // scale-adaptive state partitioning — see
      // StreamOps.adaptiveStatePartitions
      val q = graft.streaming.StreamOps.withStatePartitions(s,
          graft.streaming.StreamOps.pathBytes(src)) {
        graft.streaming.StreamOps.windowedCounts(stream)
          .writeStream.format("parquet")
          .option("path", out.toString)
          .option("checkpointLocation", cp.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      }
      q.awaitTermination()
      val progress = q.recentProgress
      val dataBatches = progress.count(_.numInputRows > 0).toLong
      val dropped = progress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
      val res = s.read.parquet(out.toString)
        .orderBy(col("bucket"), col("key")).localCheckpoint()
      (res, dataBatches, dropped)
    } finally {
      Shared.deleteTree(src); Shared.deleteTree(out); Shared.deleteTree(cp)
    }
  }

  // private[queries]: Extras2's k10 lateness audit runs over the same
  // replay relation, so its oracle interpolates the same mapping.
  private[queries] val replaySql = """
      SELECT 'events' AS "topic", CAST(event_id % 8 AS INT) AS "partition",
        event_id AS "offset", date_trunc('milliseconds', ts) AS "timestamp",
        event_type AS "key",
        CASE WHEN event_id % 97 = 0 THEN NULL ELSE props END AS "value",
        CASE WHEN event_id % 97 = 0 THEN 'simulated broker error' END AS "error"
      FROM events"""

  val oracles: Map[String, String] = Map(
    "k01_replay_records" ->
      s"""SELECT * FROM ($replaySql) ORDER BY "offset"""",

    "k02_decode_errors" -> s"""
      SELECT count(*) AS n_total, count("error") AS n_errors,
        CAST(sum(CAST(json_extract_string("value", '$$.k') AS INT)) AS BIGINT) AS sum_k,
        count(*) FILTER (WHERE ("value" IS NULL) = ("error" IS NULL))
          AS n_invariant_violations
      FROM ($replaySql)""",

    "k03_partition_stats" -> s"""
      SELECT "partition", count(*) AS n, min("offset") AS min_offset,
        max("offset") AS max_offset, count("error") AS n_errors
      FROM ($replaySql) GROUP BY 1 ORDER BY 1""",

    "k06_offset_audit" -> s"""
      WITH r AS (SELECT "partition", "offset",
          "offset" - lag("offset", 1) OVER (PARTITION BY "partition"
            ORDER BY "offset") - 1 AS gap
        FROM ($replaySql))
      SELECT "partition", count(*) AS n,
        min("offset") AS min_offset, max("offset") AS max_offset,
        count(*) FILTER (WHERE gap > 0) AS n_gaps,
        CAST(coalesce(sum(gap), 0) AS BIGINT) AS n_missing,
        CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap
      FROM r GROUP BY 1 ORDER BY 1""",

    "k07_compacted_view" -> s"""
      SELECT "partition", "key", "offset", "value" FROM (
        SELECT DISTINCT ON ("partition", "key")
          "partition", "key", "offset", "value"
        FROM ($replaySql)
        ORDER BY "partition", "key", "offset" DESC)
      WHERE "value" IS NOT NULL
      ORDER BY "partition", "key"""",

    "k08_consumer_lag" -> s"""
      WITH r AS ($replaySql),
      c AS (SELECT max("timestamp") - INTERVAL 1 HOUR AS cut FROM r)
      SELECT "topic", "partition", count(*) AS n,
        max("offset") AS end_offset,
        max(CASE WHEN "timestamp" <= cut THEN "offset" END)
          AS committed_offset,
        max("offset") - max(CASE WHEN "timestamp" <= cut THEN "offset" END)
          AS lag
      FROM r, c GROUP BY 1, 2 ORDER BY "partition"""",

    "k09_error_bursts" -> s"""
      WITH r AS ($replaySql),
      wins AS (SELECT time_bucket(INTERVAL 6 HOUR, "timestamp")
            AS win_start,
          count(*) AS n, count("error") AS n_errors
        FROM r GROUP BY 1),
      ov AS (SELECT count(*) AS n_total, count("error") AS e_total FROM r)
      SELECT win_start, n, n_errors,
        round(n_errors / CAST(n AS DOUBLE), 6) AS err_rate
      FROM wins, ov
      WHERE n_errors * n_total * 2 >= e_total * n * 3
      ORDER BY win_start""",

    // Same cutoff the streaming run applies: append mode emits a window
    // once the watermark (max event time − 10 min) reaches its END.
    "k18_streaming_counts" -> s"""
      WITH r AS ($replaySql),
      m AS (SELECT max("timestamp") - INTERVAL 10 MINUTE AS wm FROM r),
      w AS (SELECT time_bucket(INTERVAL 5 MINUTE, "timestamp") AS bucket,
              "key", count(*) AS n
            FROM r GROUP BY 1, 2)
      SELECT bucket, "key", n FROM w, m
      WHERE bucket + INTERVAL 5 MINUTE <= wm
      ORDER BY bucket, "key"""",

    // The same per-batch cutoff sequence the multi-batch streaming run
    // applies. Spark (3.4+, SPARK-40925) filters LATE EVENTS in batch k
    // with the PREVIOUS batch's watermark — the value state eviction
    // last used, so a surviving row can never target an already-emitted
    // window — while EVICTION uses the current batch's watermark. Batch
    // k's own watermark is computed from data through batch k−1, so the
    // late-filter cutoff for file k is cummax(file max event time over
    // files <= k−2) − 10 min (hence `2 PRECEDING`; the first TWO batches
    // drop nothing), empirically confirmed batch-by-batch against the
    // run's numRowsDroppedByWatermark. A window is emitted iff its end
    // <= the final watermark (the AvailableNow flush batch).
    "k19_streaming_multibatch" -> s"""
      WITH r AS ($replaySql),
      bnds AS (SELECT min(epoch_us("timestamp")) AS mn,
                      max(epoch_us("timestamp")) AS mx FROM r),
      f AS (SELECT r.*,
              CASE WHEN "offset" % 19 = 0
                THEN least(((epoch_us("timestamp") - mn) * 4)
                             // (mx - mn + 1) + 2, 3)
                ELSE ((epoch_us("timestamp") - mn) * 4) // (mx - mn + 1)
              END AS fidx
            FROM r, bnds),
      fm AS (SELECT fidx, max("timestamp") AS fmax FROM f GROUP BY fidx),
      wmk AS (SELECT fidx,
                max(fmax) OVER (ORDER BY fidx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
                  - INTERVAL 10 MINUTE AS wprev
              FROM fm),
      fin AS (SELECT max("timestamp") - INTERVAL 10 MINUTE AS wfinal FROM r),
      surv AS (SELECT time_bucket(INTERVAL 5 MINUTE, f."timestamp")
                 AS bucket, f."key" AS "key"
               FROM f JOIN wmk USING (fidx)
               WHERE wmk.wprev IS NULL
                  OR time_bucket(INTERVAL 5 MINUTE, f."timestamp")
                     + INTERVAL 5 MINUTE > wmk.wprev)
      SELECT bucket, "key", count(*) AS n
      FROM surv, fin
      WHERE bucket + INTERVAL 5 MINUTE <= wfinal
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "k04_partition_pruned" -> s"""
      SELECT "partition", count(*) AS n, min("offset") AS min_offset,
        max("offset") AS max_offset
      FROM ($replaySql) WHERE "partition" IN (0, 3)
      GROUP BY 1 ORDER BY 1""",

    "k05_time_pruned" -> s"""
      SELECT "partition", count(*) AS n, min("timestamp") AS min_ts,
        max("timestamp") AS max_ts
      FROM ($replaySql)
      WHERE "timestamp" >= TIMESTAMP '2024-01-05 00:00:00'
        AND "timestamp" < TIMESTAMP '2024-01-12 00:00:00'
      GROUP BY 1 ORDER BY 1""")
}
