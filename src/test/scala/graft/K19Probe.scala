package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Diagnostic main: print every micro-batch's numInputRows, watermark,
  * and dropped-by-watermark counts for the k19 run. This is how the
  * oracle's cutoff sequence was confirmed empirically: batch k's
  * late-event filter uses the PREVIOUS batch's watermark (SPARK-40925)
  * while eviction uses the current one — visible here as batch id=3
  * reporting wm through file 2 but drop counts matching file 1's cutoff.
  * Usage: Test/runMain graft.K19Probe [sfDir]
  */
object K19Probe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.create("k19probe", "8")
    s.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
        println(s"K19BATCH id=${p.batchId} rows=${p.numInputRows} " +
          s"wm=${p.eventTime.get("watermark")} " +
          s"maxEt=${p.eventTime.get("max")} dropped=$dropped")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val (res, batches, dropped) =
      graft.queries.KafkaParity.multiBatchReplay(s,
        args.headOption.getOrElse("/root/testdata/sf0.01"))
    println(s"K19RESULT rows=${res.count()} batches=$batches dropped=$dropped")
    Thread.sleep(2000)
    s.stop()
  }
}
