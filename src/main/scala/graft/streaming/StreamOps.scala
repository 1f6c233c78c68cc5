package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}
import org.apache.spark.sql.types._

import graft.sources.{KafkaRecord, KafkaSource}

/** A detected hole in a partition's offset sequence. */
case class OffsetGap(topic: String, partition: Int,
    fromOffset: Long, toOffset: Long)

/** Per-(topic,partition) offset tracking state. */
case class OffsetState(lastOffset: Long)

/** [[StreamOps.detectOffsetGaps]] re-expressed on Spark 4's
  * transformWithState API: the same bounded one-long-per-partition state,
  * held in a typed [[ValueState]] under the RocksDB state store (the new
  * API's required provider). Same emission contract as the
  * flatMapGroupsWithState twin — the spec gates their parity.
  */
class OffsetGapProcessor
    extends StatefulProcessor[(String, Int), KafkaRecord, OffsetGap] {
  @transient private var last: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[Long]("lastOffset", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: (String, Int),
      rows: Iterator[KafkaRecord], tv: TimerValues): Iterator[OffsetGap] = {
    val sorted = rows.map(_.offset).toArray.sorted
    var l = if (last.exists()) last.get() else -1L
    val gaps = Seq.newBuilder[OffsetGap]
    sorted.foreach { off =>
      if (l >= 0 && off > l + 1) gaps += OffsetGap(key._1, key._2, l, off)
      if (off > l) l = off
    }
    last.update(l)
    gaps.result().iterator
  }
}

/** One observation entering the streaming CUSUM: `tsUs`/`eventId` give
  * the per-key total order, `value` the measured series.
  */
case class CusumPoint(key: String, tsUs: Long, eventId: Long, value: Double)

/** Per-row CUSUM emission: detect = runningSum − runningMin, ≥ 0. */
case class CusumUpdate(key: String, eventId: Long, detect: BigDecimal)

/** (runningSum, runningMin-including-current) — the whole CUSUM state. */
case class CusumState(s: BigDecimal, minS: BigDecimal)

/** Streaming CUSUM drift detector — the transformWithState twin of the
  * batch q71 formulation (running sum of (value − target) minus its
  * running minimum): two DECIMAL-exact numbers of state per key, emitted
  * per row. The same left-to-right decimal arithmetic as the batch
  * windows, so after replaying a key's (tsUs, eventId) order the per-key
  * peak detect is BIT-IDENTICAL to the batch query — StreamingSpec gates
  * it. Rows are sorted within each micro-batch; cross-batch order is the
  * source's responsibility (Kafka per-partition order in production).
  */
class CusumProcessor(target: BigDecimal)
    extends StatefulProcessor[String, CusumPoint, CusumUpdate] {
  @transient private var st: ValueState[CusumState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CusumState]("cusum",
      Encoders.product[CusumState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[CusumPoint],
      tv: TimerValues): Iterator[CusumUpdate] = {
    var (s, minS, seen) =
      if (st.exists()) { val c = st.get(); (c.s, c.minS, true) }
      else (BigDecimal(0), BigDecimal(0), false)
    val out = rows.toArray.sortBy(p => (p.tsUs, p.eventId)).map { p =>
      // the same double→DECIMAL(·,6) conversion Spark's cast performs
      val dev = BigDecimal(java.math.BigDecimal.valueOf(p.value))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) - target
      s += dev
      minS = if (seen) minS.min(s) else s
      seen = true
      CusumUpdate(p.key, p.eventId, s - minS)
    }
    st.update(CusumState(s, minS))
    out.iterator
  }
}

/** One event entering the per-user running-stats processor; `tsUs` is
  * epoch-micros of the event time (kept integral so the emitted column
  * avoids NTZ/LTZ cross-engine pitfalls).
  */
case class UserEvent(userId: Long, eventId: Long, tsUs: Long, value: Double)

/** Per-(user, micro-batch) emission of [[UserStatsProcessor]]: the
  * cumulative state AFTER folding this batch's rows. `nCum` strictly
  * increases per user across batches, so (userId, nCum) identifies the
  * batch without a batch-id column.
  */
case class UserStats(userId: Long, nCum: Long, sumCum: BigDecimal,
    lastTsUs: Long)

/** The whole running-stats state: three scalars per user. */
case class UserStatsState(n: Long, sum: BigDecimal, maxTsUs: Long)

/** Per-user running stats on Spark 4's transformWithState (VERDICT r10
  * item 4 — the arbitrary-state API a new engine should lead with,
  * promoted from the spec surface to an oracle-gated query): one typed
  * [[ValueState]] cell per user holding (count, DECIMAL(·,2)-exact value
  * sum, max event time), folded with each micro-batch's rows and emitted
  * once per (user, batch-with-input). Decimal addition is exact, so the
  * cumulative emission is bit-reproducible from the batch slicing alone —
  * what lets a DuckDB window oracle strict-certify a stateful streaming
  * run (k23). State is three scalars per user — bounded regardless of
  * stream volume — and `ttl` (processing-time TTL, requires
  * TimeMode.ProcessingTime) bounds the KEY dimension for 100 TB key
  * churn: users idle past the TTL are evicted and restart from zero, the
  * Round11Spec probe's assertion.
  */
class UserStatsProcessor(ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[Long, UserEvent, UserStats] {
  @transient private var st: ValueState[UserStatsState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[UserStatsState]("stats",
      Encoders.product[UserStatsState], ttl)

  override def handleInputRows(key: Long, rows: Iterator[UserEvent],
      tv: TimerValues): Iterator[UserStats] = {
    var (n, sum, mx) =
      if (st.exists()) { val c = st.get(); (c.n, c.sum, c.maxTsUs) }
      else (0L, BigDecimal(0).setScale(2), Long.MinValue)
    rows.foreach { r =>
      n += 1
      // the same double→DECIMAL(·,2) conversion Spark's cast performs
      sum += BigDecimal(java.math.BigDecimal.valueOf(r.value))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      if (r.tsUs > mx) mx = r.tsUs
    }
    st.update(UserStatsState(n, sum, mx))
    Iterator.single(UserStats(key, n, sum, mx))
  }
}

/** One event entering the per-type counts processor (k27). */
case class TypedUserEvent(userId: Long, eventId: Long, eventType: String)

/** [[TypeCountsProcessor]]'s emission: one row per (user, active batch,
  * event type in state) — `batchSeq` is the per-user ordinal of batches
  * the user appeared in (a ValueState counter), which identifies the
  * batch without a batch-id column; `maxEidCum` is the running max event
  * id, recomputed from the ListState journal.
  */
case class TypeCountUpdate(userId: Long, batchSeq: Long, eventType: String,
    nCum: Long, maxEidCum: Long)

/** Per-user per-event-type running counts on the two transformWithState
  * state cells k23's ValueState left uncovered (VERDICT follow-through on
  * "the API's full public sub-surface"):
  *  - a typed [[MapState]] (user key → dynamic map<type, count>) folded
  *    with each batch's rows and read back by full iteration — the
  *    cell a per-key DYNAMIC dimension needs at 100 TB (a ValueState of
  *    Map would rewrite the whole map per update; MapState updates one
  *    entry per touched type);
  *  - a typed [[ListState]] journal (per-batch max event id appended
  *    once per batch) whose fold-on-read gives the running max — the
  *    append-only shape (logs, recent-N buffers) ValueState can't grow
  *    incrementally.
  * Emission: after folding a batch, every (type → cumulative count) in
  * the user's map, tagged with the user's batch ordinal — in-order
  * quartile replay makes the batch DuckDB oracle exact (k27), exactly
  * the k23 discipline extended to a dynamic per-key dimension. State is
  * |types|+|batches|+1 rows per user — bounded (5 types, 4 batches).
  */
class TypeCountsProcessor
    extends StatefulProcessor[Long, TypedUserEvent, TypeCountUpdate] {
  @transient private var counts: org.apache.spark.sql.streaming
    .MapState[String, Long] = _
  @transient private var eidLog: org.apache.spark.sql.streaming
    .ListState[Long] = _
  @transient private var batches: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long]("counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    eidLog = getHandle.getListState[Long]("eidLog",
      Encoders.scalaLong, TTLConfig.NONE)
    batches = getHandle.getValueState[Long]("batches",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[TypedUserEvent],
      tv: TimerValues): Iterator[TypeCountUpdate] = {
    val seq = (if (batches.exists()) batches.get() else 0L) + 1L
    batches.update(seq)
    // ONE streaming pass over the (possibly huge) per-key batch (ADVICE
    // r12: toSeq + groupBy materialized the whole batch — unbounded
    // per-key-batch task memory, at odds with the 100 TB framing): a
    // small type→delta map plus a running max, both bounded by |types|.
    val deltas = scala.collection.mutable.Map.empty[String, Long]
    var batchMaxEid = Long.MinValue
    rows.foreach { r =>
      deltas.updateWith(r.eventType)(p => Some(p.getOrElse(0L) + 1L))
      if (r.eventId > batchMaxEid) batchMaxEid = r.eventId
    }
    deltas.foreach { case (t, dn) =>
      val prev = if (counts.containsKey(t)) counts.getValue(t) else 0L
      counts.updateValue(t, prev + dn)
    }
    eidLog.appendValue(batchMaxEid)
    val maxEid = eidLog.get().max // fold the journal on read
    counts.iterator().map { case (t, n) =>
      TypeCountUpdate(key, seq, t, n, maxEid)
    }.toSeq.iterator
  }
}

/** One event entering the timer-based alert processor: the watermark
  * column stays a genuine TIMESTAMP through the typed boundary.
  */
case class UserTimedEvent(userId: Long, eventId: Long, ts: java.sql.Timestamp)

/** [[FirstSeenAlertProcessor]]'s emission: the alert fires exactly at
  * firstSeenMs + gap, carried as epoch-ms (integral — no NTZ/LTZ
  * cross-engine pitfalls).
  */
case class UserAlert(userId: Long, alertTsMs: Long)

/** Event-time TIMERS on transformWithState — the last sub-surface of
  * Spark 4's arbitrary-state API (state cells: k23; TTL: Round11Spec;
  * timers: THIS): on a user's FIRST event, register one event-time timer
  * at firstTs + gap; the engine fires it through [[handleExpiredTimer]]
  * once the watermark passes, and the emission is (user, firstTs + gap)
  * regardless of WHICH micro-batch fires it — that firing-order
  * independence is what makes a batch oracle exact: alert set =
  * {user : first_ts + gap <= final watermark} (k25 certifies it).
  * State is one long + one timer row per user, bounded for any volume.
  *
  * Out-of-order arrival is handled by MIN-MERGING (ADVICE r11): a later
  * batch carrying an event below the stored first-seen deletes the old
  * timer and re-registers at the revised time. The revision window is
  * exactly the timer's pre-firing life: once the timer at firstMs + gap
  * has fired, the watermark is >= firstMs + gap, so any admissible row
  * (ts >= watermark) satisfies ts >= firstMs + gap > firstMs and can
  * never revise — the emitted alert is always the global-min alert.
  */
class FirstSeenAlertProcessor(gapMs: Long)
    extends StatefulProcessor[Long, UserTimedEvent, UserAlert] {
  @transient private var firstMs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    firstMs = getHandle.getValueState[Long]("firstMs", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserTimedEvent],
      tv: TimerValues): Iterator[UserAlert] = {
    val batchMin = rows.map(_.ts.getTime).min
    if (!firstMs.exists()) {
      firstMs.update(batchMin)
      getHandle.registerTimer(batchMin + gapMs)
    } else if (batchMin < firstMs.get()) {
      // out-of-order row below the stored first: the timer cannot have
      // fired yet (see class scaladoc), so move it to the revised time
      getHandle.deleteTimer(firstMs.get() + gapMs)
      firstMs.update(batchMin)
      getHandle.registerTimer(batchMin + gapMs)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[UserAlert] =
    Iterator.single(UserAlert(key, info.getExpiryTimeInMs))
}

/** Test-surface twin of [[FirstSeenAlertProcessor]] covering
  * [[org.apache.spark.sql.streaming.StatefulProcessorHandle.listTimers]]
  * — the one timer call k25 and the min-merge leave unexercised: on
  * first sight it registers a timer at firstTs + g for EVERY g in
  * `gapsMs`; on any later batch it walks `listTimers()` and deletes all
  * but the earliest. Exactly one alert (the earliest) must survive —
  * Round12Spec replays it.
  */
class TimerCullProbeProcessor(gapsMs: Seq[Long])
    extends StatefulProcessor[Long, UserTimedEvent, UserAlert] {
  @transient private var firstMs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    firstMs = getHandle.getValueState[Long]("firstMs", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserTimedEvent],
      tv: TimerValues): Iterator[UserAlert] = {
    if (!firstMs.exists()) {
      val first = rows.map(_.ts.getTime).min
      firstMs.update(first)
      gapsMs.foreach(g => getHandle.registerTimer(first + g))
    } else {
      val live = getHandle.listTimers().toSeq.sorted
      live.drop(1).foreach(getHandle.deleteTimer)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[UserAlert] =
    Iterator.single(UserAlert(key, info.getExpiryTimeInMs))
}

/** Structured Streaming surface (SURVEY.md §2.2 streaming rows): the
  * streaming twin of the batch replay source plus watermarked windows,
  * streaming dedup, and session windows.
  *
  * The reference's scan blocks forever on an idle topic and commits per
  * message (src/kafquack_extension.cpp:146-151, 199-203); the Spark model
  * replaces both with micro-batch triggers + checkpointed offsets
  * (SURVEY.md §1.4 documents the delivery-semantics upgrade).
  */
object StreamOps {

  /** Scale-adaptive STATE-partition count for a streaming query — the
    * streaming analogue of AQE partition coalescing, which stateful
    * streaming cannot use (AQE is disabled under MicroBatchExecution).
    *
    * Every stateful operator instantiates `spark.sql.shuffle.partitions`
    * state stores per micro-batch, and each store-partition carries a
    * FIXED per-batch cost — load, update/removal scan, commit (delta
    * file create + rename + CRC), maintenance scheduling, coordinator
    * bookkeeping — paid regardless of how many rows it holds. Measured
    * on the k20 interval-join replay at sf0.1 (17 MB fixture): the warm
    * replay runs 26.5 s with 32 state partitions (4 stores × 32
    * partitions per batch; summed commitTimeMs ≈ 92 s/batch ≈ 700 ms per
    * store) vs 4.9 s with 4 partitions (commit ≈ 44 ms per store) — the
    * cost is contention-amplified fixed overhead, not I/O (the same
    * filesystem does 256 create+write+rename in 0.1 s). So the
    * partition count must scale with the STATE, not sit at a constant
    * tuned for either local mode or the cluster (optimization-guide §2):
    *
    *   partitions = min(spark.sql.shuffle.partitions,
    *                    max(minPartitions, ceil(inputBytes / 64 MiB)))
    *
    * `spark.sql.shuffle.partitions` stays the CEILING — a 100 TB
    * deployment sets it on submit (GraftSession scaladoc) and large
    * inputs saturate it, so production behavior is unchanged; only
    * inputs small enough that per-partition overhead dominates are
    * coalesced. The floor (default 4) keeps multi-partition state
    * semantics (cross-partition watermark min, salted-skew spread)
    * exercised even on toy inputs. Output is partition-count-invariant:
    * state partitioning is a hash layout, never a semantic.
    */
  def adaptiveStatePartitions(s: SparkSession, inputBytes: Long,
      targetBytesPerPartition: Long = 64L << 20,
      minPartitions: Int = 4): Int =
    // manual operational override (also how the before/after experiments
    // force the pre-adaptive layout at any SF): when set to a positive
    // int, it wins verbatim; anything else (malformed, zero, negative —
    // e.g. an env var leaking into sbt test) is rejected loudly and the
    // adaptive value applies, rather than starting a broken query deep
    // inside a replay (ADVICE r14).
    sys.env.get("SPARK_GRAFT_STREAM_SHUFFLE").flatMap { v =>
      val parsed = v.toIntOption.filter(_ > 0)
      if (parsed.isEmpty) System.err.println(
        s"[graft] ignoring invalid SPARK_GRAFT_STREAM_SHUFFLE='$v' " +
        "(need a positive int); using the adaptive value")
      parsed
    }.getOrElse {
      val ceiling = s.conf.get("spark.sql.shuffle.partitions").toInt
      math.max(1, math.min(ceiling, math.max(minPartitions,
        math.ceil(inputBytes.toDouble / targetBytesPerPartition).toInt)))
    }

  /** Run `body` (typically `writeStream…start(); awaitTermination()`)
    * with `spark.sql.shuffle.partitions` set to
    * [[adaptiveStatePartitions]] of `inputBytes`, restoring the previous
    * value after. The streaming query pins its state-partition count
    * from the session conf at `start()`, so scoping the override to the
    * replay leaves every batch query in the session untouched.
    *
    * NOT concurrency-safe (ADVICE r14): the override mutates the shared
    * session conf for the duration of `body`, so a query started
    * concurrently in the SAME SparkSession during that window would
    * inherit the reduced count. Every caller today (bench, verify,
    * tests) starts queries sequentially; a future concurrent harness
    * must run each replay on `spark.newSession()` instead.
    */
  def withStatePartitions[T](s: SparkSession, inputBytes: Long)
      (body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, adaptiveStatePartitions(s, inputBytes).toString)
    try body finally s.conf.set(key, prev)
  }

  /** Total bytes under a path (file, or directory walked recursively) —
    * the `inputBytes` feeder for [[withStatePartitions]] when the stream
    * replays local files.
    */
  def pathBytes(p: java.nio.file.Path): Long = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(p)) 0L
    else scala.util.Using.resource(java.nio.file.Files.walk(p)) { st =>
      st.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum
    }
  }

  /** Streaming file-replay of the events table in the 7-column
    * kafka_consumer shape — the zero-infrastructure stand-in for
    * [[KafkaSource.stream]] used by tests and local runs.
    *
    * FileStreamSource needs an explicit schema, and the fixture's `ts`
    * precision has drifted across generator versions (nanosecond parquet —
    * a long under the nanosAsLong flag — vs native microsecond
    * TIMESTAMP_NTZ). Hard-coding either form silently corrupts the other
    * (micros read as nanos land every event in 1970, so the watermark
    * drops nearly the whole stream), so the schema comes from a one-time
    * batch read of the footer and `ts` is normalized to TIMESTAMP_NTZ
    * micros the same way [[Tables.load]] does.
    */
  def replayStream(spark: SparkSession, dir: String,
      topic: String = "events"): DataFrame =
    KafkaSource.replay(eventStream(spark, dir), topic)

  /** The raw events fixture as a normalized stream (ts → TIMESTAMP_NTZ
    * micros), without the Kafka-record projection — the input shape for
    * stream-static enrichment over the business columns.
    */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    // The fixture is a single file, not a directory; FileStreamSource
    // insists on a directory basePath, but a glob makes it derive the
    // parent dir as the base itself.
    val glob = s"$dir/events*.parquet"
    val onDisk = spark.read.parquet(glob).schema
    val raw = spark.readStream.schema(onDisk).parquet(glob)
    if (onDisk("ts").dataType == LongType)
      raw.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    else raw.withColumn("ts", col("ts").cast(TimestampNTZType))
  }

  /** Stream-static anomaly gate (q92's streaming twin): each event joins
    * its (event_type, hour-of-day) stats row — a broadcast dimension
    * refreshed per micro-batch — and passes only if it falls outside
    * mean ± nSigma·sd. Stateless map-side filtering: no watermark, no
    * state store; the stats table is the (type × 24)-sized artifact the
    * batch job publishes.
    */
  def anomalyFlags(events: DataFrame, stats: DataFrame,
      nSigma: Double = 2.0): DataFrame =
    events
      .withColumn("hour", hour(col("ts")).cast("int"))
      .withColumn("vd", col("value")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
      .join(broadcast(stats), Seq("event_type", "hour"))
      .filter(abs(col("vd").cast("double") - col("mean")) >
        col("sd") * nSigma)

  /** Tumbling (or, with `slide`, hopping) window counts with a watermark:
    * the canonical streaming agg. Late rows beyond `lateness` are dropped;
    * output in append mode once the watermark passes the window end.
    */
  def windowedCounts(records: DataFrame, timeCol: String = "timestamp",
      windowLen: String = "5 minutes",
      lateness: String = "10 minutes",
      slide: Option[String] = None): DataFrame =
    records
      .withWatermark(timeCol, lateness)
      .groupBy(slide.fold(window(col(timeCol), windowLen))(s =>
        window(col(timeCol), windowLen, s)).as("win"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("bucket"), col("key"), col("n"))

  /** Windowed approximate distinct entities per event type: the
    * cardinality stream (unique users per window) via HLL++ partials
    * merged through the streaming state store — constant state per
    * (window, type) regardless of user volume, the 100 TB-day shape.
    * The estimator is Spark's own on both the streaming and batch
    * paths, so the batch twin is an exact-equality gate (same sketch,
    * same merges up to merge order — asserted in StreamingSpec).
    */
  def windowedDistinctUsers(events: DataFrame,
      timeCol: String = "ts", keyCol: String = "event_type",
      entityCol: String = "user_id", windowLen: String = "1 day",
      lateness: String = "1 hour"): DataFrame =
    events
      // watermarks require TIMESTAMP; NTZ→LTZ is value-preserving under
      // the UTC session (the Tables.load convention)
      .withColumn(timeCol, col(timeCol).cast("timestamp"))
      .withWatermark(timeCol, lateness)
      .groupBy(window(col(timeCol), windowLen).as("win"), col(keyCol))
      .agg(approx_count_distinct(col(entityCol)).as("approx_users"))
      .select(col("win.start").as("bucket"), col(keyCol),
        col("approx_users"))

  /** Streaming exact dedup bounded by the watermark — duplicate keys seen
    * within the lateness horizon are dropped; state is GC'd past it.
    */
  def dedupWithinWatermark(records: DataFrame, keyCols: Seq[String],
      timeCol: String = "timestamp",
      lateness: String = "10 minutes"): DataFrame =
    records.withWatermark(timeCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Custom stateful operator (SURVEY.md §2.2 "Streaming: stateful ops"):
    * per-(topic,partition) offset-gap detection over an at-least-once
    * stream, via flatMapGroupsWithState. State is one long per partition —
    * bounded regardless of stream volume. Offsets are sorted within each
    * micro-batch group so emission is deterministic.
    */
  def detectOffsetGaps(records: Dataset[KafkaRecord]): Dataset[OffsetGap] = {
    import records.sparkSession.implicits._
    records.groupByKey(r => (r.topic, r.partition))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, Int), rows: Iterator[KafkaRecord],
            state: GroupState[OffsetState]) =>
          val sorted = rows.map(_.offset).toArray.sorted
          var last = state.getOption.map(_.lastOffset).getOrElse(-1L)
          val gaps = Seq.newBuilder[OffsetGap]
          sorted.foreach { off =>
            if (last >= 0 && off > last + 1)
              gaps += OffsetGap(key._1, key._2, last, off)
            if (off > last) last = off
          }
          state.update(OffsetState(last))
          gaps.result().iterator
      }
  }

  /** [[detectOffsetGaps]] on the transformWithState API (Spark 4's
    * arbitrary-state surface — typed state cells, timers, TTL): identical
    * semantics, state lives in a per-key [[ValueState]] long. Requires
    * the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — the caller sets it; the
    * HDFS-backed default store does not support this operator.
    */
  def detectOffsetGapsTws(records: Dataset[KafkaRecord]): Dataset[OffsetGap] = {
    import records.sparkSession.implicits._
    records.groupByKey(r => (r.topic, r.partition))
      .transformWithState(new OffsetGapProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Per-user running stats over typed events (see [[UserStatsProcessor]]);
    * requires the RocksDB state store provider, like every
    * transformWithState op. `ttl` other than NONE switches the stream to
    * processing-time mode (TTL cells need a clock).
    */
  def userStatsTws(events: Dataset[UserEvent],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    events.groupByKey(_.userId)
      .transformWithState(new UserStatsProcessor(ttl), timeMode,
        OutputMode.Append())
  }

  /** First-activity alerts via event-time TIMERS (see
    * [[FirstSeenAlertProcessor]]); the input Dataset must already carry
    * a watermark on `ts` (TimeMode.EventTime requires one), and the
    * RocksDB provider, like every transformWithState op.
    */
  def firstSeenAlerts(events: Dataset[UserTimedEvent],
      gapMs: Long = 48L * 3600 * 1000): Dataset[UserAlert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new FirstSeenAlertProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** listTimers cull probe (see [[TimerCullProbeProcessor]]); test
    * surface for Round12Spec, RocksDB + event-time watermark required.
    */
  def timerCullProbe(events: Dataset[UserTimedEvent],
      gapsMs: Seq[Long]): Dataset[UserAlert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new TimerCullProbeProcessor(gapsMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Per-user per-type running counts via MapState + ListState (see
    * [[TypeCountsProcessor]]); requires the RocksDB provider, like every
    * transformWithState op.
    */
  def typeCountsTws(events: Dataset[TypedUserEvent])
      : Dataset[TypeCountUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new TypeCountsProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Streaming CUSUM over typed points (see [[CusumProcessor]]); requires
    * the RocksDB state store provider, like every transformWithState op.
    */
  def cusumStream(points: Dataset[CusumPoint],
      target: BigDecimal = BigDecimal(50)): Dataset[CusumUpdate] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key)
      .transformWithState(new CusumProcessor(target), TimeMode.None(),
        OutputMode.Append())
  }

  /** Stream-static enrichment join: the static dimension broadcasts to the
    * stream side — no streaming state, no shuffle of the stream.
    */
  def enrich(stream: DataFrame, dim: DataFrame,
      joinKeys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), joinKeys, "left")

  /** Streaming corpus sketch: per-key union MinHash maintained across
    * micro-batches — drives the typed [[graft.functions.MinhashUnion]]
    * Aggregator through the streaming engine's partial-agg + state-merge
    * path (buffer serialization included). At 100 TB/day this is the
    * incremental dedup-index builder: the per-key state is one 16-long
    * array regardless of volume.
    */
  def sketchByKey(docs: DataFrame, keyCol: String = "source",
      textCol: String = "text"): DataFrame =
    docs.groupBy(col(keyCol))
      .agg(graft.functions.MinhashUnion.minhash_union()(
        graft.functions.TextFunctions.minhash_signature(col(textCol)))
        .as("union_sig"),
        count(lit(1)).as("n_docs"))

  /** Streaming frequent-term candidates per key: the Misra-Gries sketch
    * ([[graft.functions.MisraGries]]) driven through the streaming
    * state-merge path — per-key candidate sets over an unbounded stream
    * with ≤ `capacity` entries of state per key, ever. Merge order varies
    * across micro-batches, so counter VALUES differ from a batch fold,
    * but the candidate-superset guarantee (every term with frequency >
    * n/(capacity+1) is present) survives any merge tree — that is the
    * property downstream exact-confirm passes rely on, and what the spec
    * gates.
    */
  def frequentTermsByKey(docs: DataFrame, capacity: Int,
      keyCol: String = "source", textCol: String = "text"): DataFrame =
    docs.select(col(keyCol),
        explode(split(col(textCol), "\\s+")).as("term"))
      .groupBy(col(keyCol))
      .agg(graft.functions.MisraGries.misra_gries(capacity)(col("term"))
        .as("candidates"),
        count(lit(1)).as("n_tokens"))

  /** Stream-stream interval (event-time-bounded) inner join: right rows
    * within `[left.time, left.time + within)` for the same key. Both
    * sides carry watermarks, so each side's join state is GC'd once the
    * global (min-of-both) watermark passes the bound — left state evicts
    * at watermark − `within` (no future right row can land inside its
    * interval), right state at the watermark itself (from timeR >= timeL,
    * a right row below it can never match a future left row). The
    * condition's time range is what makes unbounded-stream state bounded
    * (an unconstrained stream-stream equi-join buffers forever).
    * Oracle-certified end-to-end through MicroBatchExecution as
    * k20_interval_join (multi-batch replay, late drops, dual-side GC).
    *
    * `joinType = "left_outer"` is the attribution/enrichment shape (k28):
    * inner matches emit immediately exactly as in the inner join; a left
    * row that never matched emits ONE null-padded row at state EVICTION —
    * i.e. once the global watermark passes `timeL + within`, when no
    * future right row can land inside its interval. The null-emission
    * timing is therefore watermark-driven, not arrival-driven: a left row
    * whose interval has not closed below the stream's final watermark
    * emits nothing at all (it is still live state). The engine tracks a
    * per-state-row matched flag, so "never matched" means no join output
    * was ever produced for that row — a pair whose right side was
    * late-dropped does NOT count as a match. Round13Spec pins the
    * eviction comparator (a window closing EXACTLY on the final
    * watermark does emit its null row — `<=`, matching the k25 timer
    * discipline) and k28 certifies the whole replay against a DuckDB
    * twin of this model.
    *
    * `joinType = "full_outer"` (k30) adds the symmetric rule for
    * unmatched RIGHT rows — with a comparator ASYMMETRY: a right row
    * evicts (and null-pads) only STRICTLY below the watermark
    * (survival is `timeR >= W`: from `timeR >= timeL`, a right row AT
    * the watermark can still match a left row arriving exactly at it),
    * while the left side keeps the inclusive window-close rule.
    * Round13Spec pins both comparators on exact-ms ties in one probe.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      keyL: String, keyR: String, timeL: String, timeR: String,
      within: String = "10 minutes",
      lateness: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(timeL, lateness)
    val r = right.withWatermark(timeR, lateness)
    l.join(r, expr(
      s"$keyL = $keyR AND $timeR >= $timeL AND " +
        s"$timeR < $timeL + INTERVAL $within"), joinType)
  }

  /** [[intervalJoin]] with SALTED state keys (VERDICT r10 item 3) — the
    * streaming twin of the batch skew discipline in
    * [[graft.operators.Skew]]: at 100 TB the join state is keyed by
    * `keyL`, and a power-law key (one user producing a large share of
    * events) concentrates its state rows — and every probe against them —
    * on ONE state-store partition, which becomes the straggler every
    * micro-batch. Salting splits each hot key across `salts` state
    * partitions: the left row takes a deterministic per-ROW salt (any
    * assignment is correct), the right side is replicated across ALL
    * salts, and the equi-key becomes (key, salt) — so each potential
    * match survives under exactly one salt and the OUTPUT is identical
    * to the unsalted join, row for row (k24 certifies it against k20's
    * oracle verbatim). Cost: right-side state ×`salts` — the standard
    * trade, cheap when the right stream is the smaller side. Watermark
    * semantics are untouched: same per-row event times, same dual
    * watermark, same late filters, same GC bounds.
    */
  def intervalJoinSalted(left: DataFrame, right: DataFrame,
      keyL: String, keyR: String, timeL: String, timeR: String,
      within: String = "10 minutes", lateness: String = "10 minutes",
      salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val l = left
      .withColumn("__salt_l",
        pmod(hash(left.columns.map(col): _*), lit(salts)))
      .withWatermark(timeL, lateness)
    val r = right
      .withColumn("__salt_r",
        explode(array((0 until salts).map(lit): _*)))
      .withWatermark(timeR, lateness)
    l.join(r, expr(
      s"$keyL = $keyR AND __salt_l = __salt_r AND " +
        s"$timeR >= $timeL AND $timeR < $timeL + INTERVAL $within"))
      .drop("__salt_l", "__salt_r")
  }

  /** [[intervalJoinSalted]] restricted to a HOT-KEY set (VERDICT r11
    * item 1) — the production shape of the salt discipline.
    * [[intervalJoinSalted]] replicates the WHOLE right stream across all
    * salts, so right-side state grows salts× on every key even though a
    * power-law workload concentrates state on a handful of keys.
    * Here only keys in `hotKeys` are salted: a hot left row takes a
    * deterministic per-row salt, a hot right row is replicated across all
    * `salts`; every COLD row (the overwhelming majority at 100 TB) keeps
    * the single salt 0 on both sides. Each potential match still
    * survives under exactly one salt — cold×cold under (key, 0),
    * hot×hot under (key, saltOfLeftRow) — so the OUTPUT is identical to
    * the unsalted join row for row (k26 certifies it against the
    * k20/k24 oracle verbatim), while right state is
    * ≈ unsalted + |hot right rows|×(salts−1) instead of ×salts on
    * everything. The hot set is a bind-time parameter: detect it from a
    * batch pre-scan / the state-store data source's per-partition
    * distribution (Round12Spec shows both the detection grain and the
    * state-row accounting). Watermark semantics untouched, as in the
    * full-salt twin.
    *
    * ==Hot-set lifecycle (100 TB posture)==
    * At production scale the head of the power law DRIFTS, and a stale
    * hot set never breaks correctness — only efficiency, and gracefully:
    * a cooled hot key wastes (salts−1) replicas of its now-few right
    * rows; a newly-hot cold key concentrates state exactly as the
    * unsalted join would (Round13Spec's drift probe runs the replay with
    * a deliberately WRONG hot set and shows output identical while the
    * skew collapse disappears). The refresh recipe is therefore a plain
    * redeploy loop, not a correctness protocol: per deployment window
    * (a) re-detect the head — a batch pre-scan of the source (the
    * [[graft.queries.Extras8.hotUserKeys]] grain) or, on a live query,
    * the state-store data source's per-partition row distribution
    * (`spark.read.format("statestore")`, the Round12Spec read); (b)
    * restart the query with the new bind-time set. Checkpoint state is
    * NOT invalidated by changing the set: every in-flight row keeps the
    * salt column value it was stored under, and matching only ever
    * compares stored salts, so a restart with a different hot set simply
    * salts NEW rows by the new rule.
    */
  def intervalJoinSaltedHot(left: DataFrame, right: DataFrame,
      keyL: String, keyR: String, timeL: String, timeR: String,
      hotKeys: Seq[Long],
      within: String = "10 minutes", lateness: String = "10 minutes",
      salts: Int = 8): DataFrame = {
    require(hotKeys.nonEmpty,
      "hotKeys must be non-empty (use intervalJoin when nothing is hot)")
    val hot = typedLit(hotKeys.distinct.sorted)
    intervalJoinSaltedWhere(left, right, keyL, keyR, timeL, timeR,
      k => array_contains(hot, col(k).cast("long")),
      within, lateness, salts)
  }

  /** [[intervalJoinSaltedHot]] for STRING (or any string-castable) keys
    * (VERDICT r12 item 3's optional variant — the long-cast restriction
    * removed): hot membership compares on `cast(key as string)`, so ids
    * that don't fit a long (UUIDs, composite string keys) salt the same
    * way. Same output-invariance argument, same lifecycle scaladoc as
    * the long twin; Round13Spec asserts the two variants agree on a
    * numeric-keyed fixture.
    *
    * ==Exact-string-form requirement (ADVICE r13)==
    * Hot membership compares Spark's CANONICAL string rendering of the
    * key column against the caller's literals. For a non-string key
    * column the two can silently disagree — DECIMAL `1.00` renders as
    * `"1.00"` not `"1"`, FLOAT/DOUBLE render with their own formatting —
    * and a mismatched literal salts NOTHING: output stays correct (cold
    * rows take salt 0 on both sides) but the skew collapse quietly
    * disappears, exactly the stale-hot-set failure mode Round13Spec's
    * drift probe measures. Pass literals in the column's canonical cast
    * form (for integral keys, the plain digits the long twin would use);
    * when in doubt use [[intervalJoinSaltedHot]] for integral keys or a
    * genuinely StringType key column here.
    */
  def intervalJoinSaltedHotStr(left: DataFrame, right: DataFrame,
      keyL: String, keyR: String, timeL: String, timeR: String,
      hotKeys: Seq[String],
      within: String = "10 minutes", lateness: String = "10 minutes",
      salts: Int = 8): DataFrame = {
    require(hotKeys.nonEmpty,
      "hotKeys must be non-empty (use intervalJoin when nothing is hot)")
    val hot = typedLit(hotKeys.distinct.sorted)
    intervalJoinSaltedWhere(left, right, keyL, keyR, timeL, timeR,
      k => array_contains(hot, col(k).cast("string")),
      within, lateness, salts)
  }

  /** Shared core of the hot-key variants: salt exactly the rows `isHot`
    * selects (left per-row, right replicated ×salts), salt 0 for the
    * cold majority — see [[intervalJoinSaltedHot]] for the invariance
    * argument.
    */
  private def intervalJoinSaltedWhere(left: DataFrame, right: DataFrame,
      keyL: String, keyR: String, timeL: String, timeR: String,
      isHot: String => org.apache.spark.sql.Column,
      within: String, lateness: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val l = left
      .withColumn("__salt_l",
        when(isHot(keyL),
          pmod(hash(left.columns.map(col): _*), lit(salts)))
          .otherwise(lit(0)))
      .withWatermark(timeL, lateness)
    val r = right
      .withColumn("__salt_r",
        explode(when(isHot(keyR),
          array((0 until salts).map(lit): _*))
          .otherwise(array(lit(0)))))
      .withWatermark(timeR, lateness)
    l.join(r, expr(
      s"$keyL = $keyR AND __salt_l = __salt_r AND " +
        s"$timeR >= $timeL AND $timeR < $timeL + INTERVAL $within"))
      .drop("__salt_l", "__salt_r")
  }

  /** The argument-swapped MIRROR of [[intervalJoin]] (k34): the interval
    * anchors on the RIGHT side's time — `timeL in [timeR, timeR + within)`
    * for the same key — so calling it with (purchases, views) and
    * `joinType = "right_outer"` reproduces the k28 views-preserving outer
    * join with the sides swapped: inner matches are the same pair set,
    * and a right (view) row with no surviving match emits one null-padded
    * row at state eviction. The preserved side's eviction rule follows
    * its STATE-WATERMARK DERIVATION, not its join side: the view side's
    * expiry is condition-derived (`timeR + within` vs the watermark) on
    * either side of the join, so the mirror keeps k28's INCLUSIVE
    * window-close comparator — Round14Spec pins the exact-ms tie on the
    * swapped shape, and k34 certifies the full replay against k28's
    * oracle verbatim. Same dual-watermark state bounds as the forward
    * form (roles swapped: left state evicts at the watermark itself,
    * right state at watermark − `within`).
    */
  def intervalJoinRightAnchor(left: DataFrame, right: DataFrame,
      keyL: String, keyR: String, timeL: String, timeR: String,
      within: String = "10 minutes",
      lateness: String = "10 minutes",
      joinType: String = "right_outer"): DataFrame = {
    val l = left.withWatermark(timeL, lateness)
    val r = right.withWatermark(timeR, lateness)
    l.join(r, expr(
      s"$keyL = $keyR AND $timeL >= $timeR AND " +
        s"$timeL < $timeR + INTERVAL $within"), joinType)
  }

  /** Session windows (gap-based) per key — the streaming twin of the
    * batch q17 sessionization: windows [ts, ts+gap) merged while they
    * overlap, held in the session-window state store across micro-batches
    * and emitted in append mode once the watermark passes the merged end.
    * Oracle-certified end-to-end as k21_streaming_sessions.
    */
  def sessionCounts(records: DataFrame, keyCol: String,
      timeCol: String = "timestamp", gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    records
      .withWatermark(timeCol, lateness)
      .groupBy(session_window(col(timeCol), gap).as("sess"), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("sess.start").as("session_start"),
        col("sess.end").as("session_end"), col("n"))
}
