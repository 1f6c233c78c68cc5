package graft

/** Prints per-batch state-operator metrics for the k20 stream-stream
  * interval join replay — the calibration tool for the oracle's per-batch
  * watermark/eviction model (K19Probe's sibling).
  *
  * Run: sbt "Test/runMain graft.K20Probe [sfDir]"
  */
object K20Probe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.create("graft-k20-probe", "8")
    val hook = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val so = p.stateOperators.headOption
        println(s"[k20probe] batch=${p.batchId} rows=${p.numInputRows} " +
          s"wm=${p.eventTime.get("watermark")} " +
          so.map(o => s"dropped=${o.numRowsDroppedByWatermark} " +
            s"removed=${o.numRowsRemoved} updated=${o.numRowsUpdated} " +
            s"total=${o.numRowsTotal} custom=${o.customMetrics}").getOrElse(""))
      }
      override def onQueryTerminated(e: org.apache.spark.sql.streaming
          .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(hook)
    val (res, batches, dropped, removed) =
      graft.queries.Extras6.intervalJoinReplay(spark, sf)
    println(s"[k20probe] pairs=${res.count()} dataBatches=$batches " +
      s"dropped=$dropped removed=$removed")
    spark.stop()
  }
}
