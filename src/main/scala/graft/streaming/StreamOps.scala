package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.KafkaSource

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

  /** The events fixture's on-disk schema (ts is nanosecond parquet, read as
    * long under the nanosAsLong flag — streaming reads need it explicit).
    */
  val eventsFileSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming file-replay of the events table in the 7-column
    * kafka_consumer shape — the zero-infrastructure stand-in for
    * [[KafkaSource.stream]] used by tests and local runs.
    */
  def replayStream(spark: SparkSession, dir: String,
      topic: String = "events"): DataFrame = {
    // The fixture is a single file, not a directory; FileStreamSource
    // insists on a directory basePath, but a glob makes it derive the
    // parent dir as the base itself.
    val raw = spark.readStream.schema(eventsFileSchema)
      .parquet(s"$dir/events*.parquet")
    KafkaSource.replay(
      raw.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType)),
      topic)
  }

  /** Tumbling-window counts with a watermark: the canonical streaming agg.
    * Late rows beyond `lateness` are dropped; output in append mode once
    * the watermark passes the window end.
    */
  def windowedCounts(records: DataFrame, timeCol: String = "timestamp",
      windowLen: String = "5 minutes",
      lateness: String = "10 minutes"): DataFrame =
    records
      .withWatermark(timeCol, lateness)
      .groupBy(window(col(timeCol), windowLen).as("win"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("bucket"), col("key"), col("n"))

  /** Streaming exact dedup bounded by the watermark — duplicate keys seen
    * within the lateness horizon are dropped; state is GC'd past it.
    */
  def dedupWithinWatermark(records: DataFrame, keyCols: Seq[String],
      timeCol: String = "timestamp",
      lateness: String = "10 minutes"): DataFrame =
    records.withWatermark(timeCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Session windows (gap-based) per key — the streaming twin of the batch
    * q17 sessionization.
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
