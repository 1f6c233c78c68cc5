package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

/** Diagnostic main: run Bench's streaming-throughput section standalone
  * (windowedCounts over the events replay, AvailableNow, noop sink) and
  * print per-run rates — for separating host contention from real
  * streaming-path regressions without a full 15-minute bench.
  * Usage: Test/runMain graft.StreamRateProbe [sfDir] [runs]
  */
object StreamRateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = GraftSession.create("stream-rate-probe")
    val rows = Tables.load(spark, sfDir, "events").count()
    (1 to runs).foreach { i =>
      val cp = Files.createTempDirectory("graft-rate-probe")
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamOps.windowedCounts(
          graft.streaming.StreamOps.replayStream(spark, sfDir))
        .writeStream.format("noop")
        .option("checkpointLocation", cp.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"RATE run=$i rows=$rows sec=$sec%.2f rate=${rows / sec}%.0f")
      graft.queries.Shared.deleteTree(cp)
    }
    spark.stop()
  }
}
