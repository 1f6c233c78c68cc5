package graft

import org.apache.spark.sql.execution.FormattedMode

/** Scratch plan dumper / single-query timer for iterating on PlanSpec
  * expectations and perf work. `SPARK_GRAFT_PROBE=time` times count() at
  * SPARK_GRAFT_SF_DIR (min of 2 runs, Bench's convention) instead of
  * printing plans.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val timing = sys.env.get("SPARK_GRAFT_PROBE").contains("time")
    // stream mode measures the bench's exact conditions — same core count
    // and therefore the same state-partition count as GraftSession default
    val stream = sys.env.get("SPARK_GRAFT_PROBE").contains("stream")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      if (timing || stream) "/root/testdata/sf0.1" else "/root/testdata/sf0.01")
    val spark = GraftSession.create("probe",
      if (timing || stream) "32" else "8")
    // SPARK_GRAFT_PROBE=phase: split one invocation's wall-clock into
    // build/analyze/optimize/physical-plan/execute — separates fixed
    // driver-side planning cost (constant at any SF) from data cost.
    if (sys.env.get("SPARK_GRAFT_PROBE").contains("phase")) {
      args.foreach { name =>
        var t0 = System.nanoTime()
        def lap(): Double = {
          val d = (System.nanoTime() - t0) / 1e9; t0 = System.nanoTime(); d
        }
        val df = SparkEntry.queries(name)(spark, dir)
        val build = lap()
        df.queryExecution.analyzed; val an = lap()
        df.queryExecution.optimizedPlan; val opt = lap()
        df.queryExecution.executedPlan; val phys = lap()
        df.count(); val exec = lap()
        println(f"PHASE $name build=$build%.2f analyze=$an%.2f " +
          f"optimize=$opt%.2f physical=$phys%.2f execute=$exec%.2f")
      }
      spark.stop(); return
    }
    // SPARK_GRAFT_PROBE=stream: run the named queries once with a
    // StreamingQueryListener attached and dump every micro-batch's
    // durationMs breakdown (triggerExecution / addBatch / getBatch /
    // queryPlanning / walCommit / commitOffsets) plus state-operator
    // commit times — the measurement tool for the k-family replay cost
    // (guide §1: find where the ~13 s/replay actually goes before
    // touching anything).
    if (sys.env.get("SPARK_GRAFT_PROBE").contains("stream")) {
      import org.apache.spark.sql.streaming.StreamingQueryListener
      val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      spark.streams.addListener(new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit =
          events.add(e.progress.json)
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
      args.foreach { name =>
        events.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"==== STREAM $name total=$sec%.2f s ====")
        // listener delivery is async; give it a moment to drain
        Thread.sleep(2000)
        events.forEach(j => println(s"PROGRESS $j"))
      }
      spark.stop(); return
    }
    // SPARK_GRAFT_PROBE=plansweep: dump explain("formatted") for EVERY
    // batch query plus one-line plan-shape stats (Exchange count, join
    // strategies, WholeStageCodegen spans) — the optimization-guide §1
    // audit artifact. Streaming replays (k18–k34) are skipped: their
    // builder EXECUTES the streaming query and returns the sink
    // read-back, so the batch explain would show a parquet scan, not the
    // plan that ran; their evidence is the =stream probe's progress dump.
    if (sys.env.get("SPARK_GRAFT_PROBE").contains("plansweep")) {
      val skip = "^k(1[89]|2\\d|3\\d)_".r
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (skip.findFirstIn(name).isDefined)
          println(s"==== $name ==== SKIPPED (streaming replay; " +
            "see SPARK_GRAFT_PROBE=stream)")
        else try {
          val df = fn(spark, dir)
          // execute THIS df's own QueryExecution (count()/noop-write
          // each build a derived one, leaving the df's
          // AdaptiveSparkPlan isFinalPlan=false): collect() runs
          // queryExecution.executedPlan itself, so the explain below
          // shows the final re-optimized plan — AQEShuffleRead nodes
          // and codegen ids of what actually ran (guide §7.2). Outputs
          // are result-sized at sf0.01, driver-safe.
          df.collect()
          val s = df.queryExecution.explainString(FormattedMode)
          val nEx = "Exchange".r.findAllIn(s).size
          val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
            "ShuffledHashJoin", "BroadcastNestedLoopJoin")
            .map(j => j -> s.sliding(j.length).count(_ == j))
            .filter(_._2 > 0).map { case (j, n) => s"$j=$n" }
          // formatted mode tags codegen membership as "[codegen id : N]"
          val wscg = "codegen id".r.findAllIn(s).size
          println(s"==== $name ==== exchanges=$nEx " +
            s"${joins.mkString(",")} wscg=$wscg")
          println(s)
        } catch {
          case e: Throwable => println(s"==== $name ==== ERR ${e.getMessage}")
        }
      }
      spark.stop(); return
    }
    // SPARK_GRAFT_PROBE=reachk: full-vs-delta reach-sketch timing at the
    // hop depths given as args (the g22 lever measurement): the systolic
    // changed-only propagation pays on the CONVERGED tail, so at k=3 on
    // the small-diameter order graph (balls still growing every hop) it
    // is overhead, while past ball saturation the delta hops collapse.
    if (sys.env.get("SPARK_GRAFT_PROBE").contains("reachk")) {
      import org.apache.spark.sql.functions.col
      val e = graft.queries.Shared.orderGraphEdges(spark, dir)
      val seeds = e.select(col("src").as("seed")).distinct()
        .filter(col("seed") < 1000000 && col("seed") % 100 === 0)
      val nNodes = e.select(col("src")).union(e.select(col("dst")))
        .distinct().count()
      println(s"REACHK nodes=$nNodes")
      args.map(_.toInt).foreach { k =>
        Seq(false, true).foreach { delta =>
          val cc = scala.collection.mutable.Buffer.empty[Long]
          val t0 = System.nanoTime()
          graft.operators.Graph.reachSketch(e, seeds, k = k, m = 64,
            edgesDeduped = true, intRegisters = true, deltaOnly = delta,
            changedCounts = if (delta) Some(cc) else None)
            .count()
          val sec = (System.nanoTime() - t0) / 1e9
          val tail = if (delta) s" changed=${cc.mkString(",")}" else ""
          println(f"REACHK k=$k delta=$delta $sec%.2f s$tail")
        }
      }
      spark.stop(); return
    }
    args.foreach { name =>
      println(s"==== $name ====")
      if (timing) {
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name: ${times.min}%.3f s (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
      } else {
        val df = SparkEntry.queries(name)(spark, dir)
        println(df.queryExecution.explainString(FormattedMode))
      }
    }
    // SPARK_GRAFT_PROBE=gwin: sweep EVERY query for unpartitioned logical
    // windows (the single-task scale hazard) — each hit must be a
    // bounded/summary-grain frame; entity-grain hits get the
    // Packing.globalRowNumber treatment. The CI version of this sweep is
    // OutputSchemaSpec's allowlist gate — keep the detection predicate
    // (logical Window, empty partitionSpec) in lockstep with it; this
    // probe additionally prints the window expressions for triage.
    if (sys.env.get("SPARK_GRAFT_PROBE").contains("gwin")) {
      import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.optimizedPlan
          val hits = plan.collect {
            case w: LWindow if w.partitionSpec.isEmpty =>
              w.windowExpressions.map(_.sql).mkString("; ").take(90)
          }
          if (hits.nonEmpty)
            println(s"GWIN $name :: ${hits.mkString(" || ")}")
        } catch {
          case e: Throwable => println(s"GWIN-ERR $name ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
