package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {

  test("ramp search: planted linear trend scores ~0, flat windows skipped") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(i: Int) = new java.sql.Timestamp(t0.getTime + i * 60000L)
    // user 1: flat prefix, an exact ramp (scaled+shifted: z-norm equal to
    // the ramp pattern), flat suffix; user 2: all flat (every window
    // skipped — sd = 0)
    val vals1 = Seq(9.0, 9.0, 9.0) ++
      (0 until 8).map(i => 100.0 + 3.0 * i) ++ Seq(9.0, 9.0)
    val rows =
      vals1.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) } ++
        (0 until 12).map(i => (2L, ts(i), (100 + i).toLong, 7.0))
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.rampSearch(df, w = 8, k = 5).collect()
    assert(got.nonEmpty)
    // rank 1 is the planted ramp at start_idx 3, distance exactly 0
    val first = got.minBy(_.getAs[Int]("rank"))
    assert(first.getAs[Long]("key") === 1L)
    assert(first.getAs[Int]("start_idx") === 3)
    assert(first.getAs[Double]("d2") === 0.0)
    // user 2 contributed nothing (all-flat series has sd = 0 everywhere)
    assert(!got.exists(_.getAs[Long]("key") === 2L))
    // every emitted distance is non-negative and ranks are dense from 1
    val ranks = got.map(_.getAs[Int]("rank")).sorted.toSeq
    assert(ranks === (1 to got.length))
    got.foreach(r => assert(r.getAs[Double]("d2") >= 0.0))
  }

  test("ramp search matches a driver-side recompute on real events") {
    val ev = Tables.load(spark, sf, "events").filter(col("user_id") < 10)
    val got = TimeSeries.rampSearch(ev, w = 8, k = 5).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Int]("start_idx")) ->
        r.getAs[Double]("d2")).toMap
    // recompute the same windows on the driver
    val series = ev.select(col("user_id"), col("ts"), col("event_id"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getLong(2),
        r.getDouble(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(x => (x._2, x._3)).map(_._4).toArray).toMap
    val qSd = math.sqrt(63.0 / 12.0)
    val qz = (0 until 8).map(i => (i - 3.5) / qSd)
    val all = series.toSeq.flatMap { case (u, vs) =>
      (0 to vs.length - 8).map { s =>
        val win = vs.slice(s, s + 8)
        val m = win.foldLeft(0.0)(_ + _) / 8.0
        val sd = math.sqrt(
          win.foldLeft(0.0)((a, x) => a + (x - m) * (x - m)) / 8.0)
        val d2 = if (BigDecimal(sd).setScale(12,
            BigDecimal.RoundingMode.HALF_UP) <= 0) Double.NaN
          else BigDecimal(win.indices.foldLeft(0.0) { (a, i) =>
            val z = (win(i) - m) / sd - qz(i)
            a + z * z
          }).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (u, s, d2)
      }
    }.filterNot(_._3.isNaN)
    val expect = all.sortBy(x => (x._3, x._1, x._2)).take(5)
      .map(x => (x._1, x._2) -> x._3).toMap
    assert(got === expect)
  }

  test("histogram quantiles bracket the exact percentile within one bin") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map(i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextDouble() * 300))
    val df = rows.toDF("k", "v")
    val out = TimeSeries.histogramQuantiles(df, "k", "v", binWidth = 10.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    for ((k, (n, p50, p90, p99)) <- out) {
      val vals = rows.filter(_._1 == k).map(_._2).sorted
      assert(n === vals.size)
      // exact percentile (smallest value with rank >= ceil(p*n)) lands
      // INSIDE the reported bin: edge <= exact < edge + width
      for ((p, edge) <- Seq(0.50 -> p50, 0.90 -> p90, 0.99 -> p99)) {
        val exact = vals((math.ceil(p * n).toInt - 1).max(0))
        assert(edge <= exact && exact < edge + 10.0,
          s"$k p$p: exact $exact outside [$edge, ${edge + 10.0})")
      }
      // monotone by construction
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("maxConcurrency sweep == driver-side active-interval recompute, " +
      "touching intervals do not overlap") {
    import spark.implicits._
    // known shape first: [0,10) [5,15) [10,20) — 1&2 overlap, 2&3
    // overlap, 1&3 only TOUCH at 10 → peak 2
    val known = Seq(("k", 0L, 10L), ("k", 5L, 15L), ("k", 10L, 20L))
      .toDF("key", "s", "e")
    val kr = TimeSeries.maxConcurrency(known, "key", col("s"), col("e"))
      .collect()
    assert(kr.length === 1)
    assert(kr.head.getAs[Long]("peak_concurrency") === 2L)
    assert(kr.head.getAs[Long]("n_intervals") === 3L)
    assert(kr.head.getAs[Long]("first_peak_at") === 5L)

    // real events: interval = floor(value)+1 units from ts-micros
    val iv = Tables.load(spark, sf, "events")
      .select(col("event_type").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("s"),
        (unix_micros(col("ts").cast("timestamp")) +
          (floor(col("value")).cast("long") + 1L) * 1000000L).as("e"))
    val got = TimeSeries.maxConcurrency(iv, "key", col("s"), col("e"))
      .collect()
      .map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("peak_concurrency")))
      .toMap
    val rows = iv.collect().map(r =>
      (r.getAs[String]("key"), r.getAs[Long]("s"), r.getAs[Long]("e")))
    val expect = rows.groupBy(_._1).map { case (k, ivs) =>
      // closed-open active count evaluated at every start instant
      val peak = ivs.map(_._2).distinct.map { t =>
        ivs.count(i => i._2 <= t && t < i._3)
      }.max
      k -> (ivs.length.toLong, peak.toLong)
    }
    assert(got === expect)
  }
}
