package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Sink surface (SURVEY.md §2.2 "Sinks" row).
  *
  * The reference extension has NO sinks — results go wherever the host
  * query sends them. The Spark engine provides the full write surface:
  * batch `df.write` to partitioned parquet (the 100 TB layout primitive)
  * and checkpointed streaming writers with exactly-once delivery to
  * file sinks (vs the reference's at-least-once per-message commits,
  * kafquack_extension.cpp:199-203).
  */
object Sinks {

  /** Batch parquet write, hash-distributed into `partitionCols` directories
    * — the layout that lets downstream scans partition-prune. At 100 TB,
    * choose low-cardinality columns (date, topic, cell) and let AQE size
    * the files.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Range-clustered batch write: rows are range-partitioned on
    * `rangeCols` and sorted within each partition before writing, so each
    * output file covers a disjoint key range and parquet min/max stats let
    * readers skip whole files on range predicates — the layout primitive
    * for time-series and id-range scans at 100 TB.
    */
  def writeRangeClustered(df: DataFrame, path: String,
      rangeCols: Seq[String], numFiles: Int,
      mode: String = "overwrite"): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = rangeCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(mode).parquet(path)
  }

  /** Streaming parquet sink with a checkpoint: offsets + file manifest are
    * committed atomically per micro-batch, so restart resumes exactly-once
    * (the delivery-semantics upgrade documented in SURVEY.md §1.4).
    */
  def parquetSink(records: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    records.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .outputMode("append")
      .start()

  /** foreachBatch escape hatch: arbitrary batch-writer logic per
    * micro-batch (upserts, multi-table fanout) with the batch id for
    * idempotence.
    */
  def foreachBatchSink(records: DataFrame, checkpoint: String)(
      f: (Dataset[Row], Long) => Unit): StreamingQuery =
    records.writeStream
      .foreachBatch(f)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Convenience: configured writer for a memory sink (tests/debug). */
  def memorySink(records: DataFrame, name: String): DataStreamWriter[Row] =
    records.writeStream.format("memory").queryName(name)

  /** Small-file compaction: rewrite a parquet dataset into ~`targetFileMB`
    * files. Streaming sinks emit one file per micro-batch per partition;
    * left alone, at 100 TB the file-listing metadata throttles every
    * downstream planning step. File count derives from the actual on-disk
    * bytes; the rewrite lands in a sibling directory first and swaps in via
    * rename, so a crash mid-compaction leaves the original data intact.
    * Returns the target file count.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileMB: Int = 512, partitionCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.col
    require(targetFileMB > 0)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val target = targetFileMB.toLong * 1024 * 1024
    val nFiles = math.max(1L, (bytes + target - 1) / target)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val df = spark.read.parquet(path)
    val writer =
      if (partitionCols.nonEmpty)
        df.repartition(nFiles.toInt, partitionCols.map(col): _*)
          .write.partitionBy(partitionCols: _*)
      else df.repartition(nFiles.toInt).write
    writer.mode("overwrite").parquet(tmp.toString)
    // swap: the new layout becomes `path` only after a complete write
    fs.delete(p, true)
    require(fs.rename(tmp, p), s"rename $tmp -> $p failed")
    nFiles
  }
}
