package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("as-of picks the latest right row at or before the left time") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 4L, "e2"), (2L, 100L, "e3"),
      (3L, 50L, "e4"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"),
      (2L, 99L, "x"))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.leftAsOf(left, right, "k", "t", "rk", "rt",
      Seq("payload")).collect().map(r =>
      (r.getAs[String]("ev"), r.getAs[String]("payload"))).toMap
    assert(out("e1") === "b") // inclusive: rt=10 matches t=10
    assert(out("e2") === null) // no right row at or before t=4
    assert(out("e3") === "x")
    assert(out("e4") === null) // key with no right rows
    assert(out.size === 4) // left-join: nothing dropped
  }

  test("forward as-of picks the earliest right row at or after the left time") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 16L, "e2"), (2L, 1L, "e3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.leftAsOf(left, right, "k", "t", "rk", "rt",
      Seq("payload"), direction = "forward").collect()
      .map(r => (r.getAs[String]("ev"), r.getAs[String]("payload"))).toMap
    assert(out("e1") === "b") // inclusive at equal time
    assert(out("e2") === null) // nothing at or after 16
    assert(out("e3") === null) // key 2 has no right rows
  }

  test("NULL-time rows match nothing, both sides, both directions") {
    import spark.implicits._
    val left = Seq((Some(1L), Option.empty[Long], "eNull"),
      (Some(1L), Some(10L), "e1")).toDF("k", "t", "ev")
    val right = Seq((Some(1L), Some(5L), "a"),
      (Some(1L), Option.empty[Long], "ghost")).toDF("rk", "rt", "payload")
    for (dir <- Seq("backward", "forward")) {
      val out = AsOfJoin.leftAsOf(left, right, "k", "t", "rk", "rt",
        Seq("payload"), direction = dir).collect()
        .map(r => (r.getAs[String]("ev"), r.getAs[String]("payload"))).toMap
      assert(out.size === 2, dir) // NULL-time LEFT rows are kept...
      assert(out("eNull") === null, dir) // ...but match nothing
      // forward previously handed eNull the min-time right row ("a");
      // and the NULL-time right row must never appear as a match
      assert(out.values.forall(_ != "ghost"), dir)
    }
  }

  test("tolerance nulls matches that are too far away") {
    import spark.implicits._
    val left = Seq((1L, 100L, "e1"), (1L, 7L, "e2")).toDF("k", "t", "ev")
    val right = Seq((1L, 5L, "a")).toDF("rk", "rt", "payload")
    val out = AsOfJoin.leftAsOf(left, right, "k", "t", "rk", "rt",
      Seq("payload"), tolerance = Some(10L)).collect()
      .map(r => (r.getAs[String]("ev"), r.getAs[String]("payload"))).toMap
    assert(out("e2") === "a")  // within 10
    assert(out("e1") === null) // 95 away
  }

  test("a matched row's NULL payload stays NULL — no back-fill, no mixing") {
    import spark.implicits._
    // The matched right row (rt=10) has p1 = NULL; an older row (rt=5) has
    // p1 = "old". Carrying columns independently would back-fill p1 from
    // the older row and emit a frankenstein match (old p1, new p2). The
    // whole match must come atomically from the rt=10 row.
    val left = Seq((1L, 20L, "e1")).toDF("k", "t", "ev")
    val right = Seq((1L, 5L, Option("old"), Option("oldB")),
      (1L, 10L, Option.empty[String], Option("newB")))
      .toDF("rk", "rt", "p1", "p2")
    val r = AsOfJoin.leftAsOf(left, right, "k", "t", "rk", "rt",
      Seq("p1", "p2")).collect()(0)
    assert(r.getAs[String]("p1") === null)
    assert(r.getAs[String]("p2") === "newB")
  }

  test("tolerance applies to the match time even when its payload is NULL") {
    import spark.implicits._
    // rt=10 (NULL payload) is the match for t=20; rt=5 ("old") is outside
    // any reasonable per-field reconstruction. With tolerance 15 the match
    // stands (dist 10) and p1 is genuinely NULL; with tolerance 3 the whole
    // match nulls out.
    val left = Seq((1L, 20L, "e1")).toDF("k", "t", "ev")
    val right = Seq((1L, 5L, Option("old"), Option("oldB")),
      (1L, 10L, Option.empty[String], Option("newB")))
      .toDF("rk", "rt", "p1", "p2")
    val within = AsOfJoin.leftAsOf(left, right, "k", "t", "rk", "rt",
      Seq("p1", "p2"), tolerance = Some(15L)).collect()(0)
    assert(within.getAs[String]("p1") === null)   // genuinely NULL match field
    assert(within.getAs[String]("p2") === "newB") // match itself stands
    val outside = AsOfJoin.leftAsOf(left, right, "k", "t", "rk", "rt",
      Seq("p1", "p2"), tolerance = Some(3L)).collect()(0)
    assert(outside.getAs[String]("p1") === null)  // whole match nulled
    assert(outside.getAs[String]("p2") === null)
  }

  test("forward as-of with tolerance bounds the future match") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 40L, "e2")).toDF("k", "t", "ev")
    val right = Seq((1L, 12L, "soon"), (1L, 90L, "late"))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.leftAsOf(left, right, "k", "t", "rk", "rt",
      Seq("payload"), direction = "forward", tolerance = Some(5L)).collect()
      .map(r => (r.getAs[String]("ev"), r.getAs[String]("payload"))).toMap
    assert(out("e1") === "soon") // 2 ahead, within 5
    assert(out("e2") === null)   // nearest future row is 50 ahead
  }

  test("randomized as-of scenarios match an in-memory reference model") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (0 until 300).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(100).toLong, i.toLong)
    } // (key, t, id)
    val right = (0 until 400).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(100).toLong)
    }.distinct // (key, rt) unique per (key, time)
    val l = left.toDF("k", "t", "id")
    val r = right.toDF("rk", "rt").withColumn("payload",
      org.apache.spark.sql.functions.col("rt"))
    val got = AsOfJoin.leftAsOf(l, r, "k", "t", "rk", "rt", Seq("payload"))
      .collect()
      .map(x => x.getAs[Long]("id") -> Option(x.get(x.fieldIndex("payload"))))
      .toMap
    val byKey = right.groupBy(_._1)
    left.foreach { case (k, t, id) =>
      val expected = byKey.getOrElse(k, Seq.empty)
        .map(_._2).filter(_ <= t).sorted.lastOption
      assert(got(id) === expected, s"key=$k t=$t")
    }
  }

  test("bucketed as-of == plain as-of on a 90%-hot-key fixture, " +
      "all directions and tolerances") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // one key owns 90% of both sides — the shape that serializes the
    // per-key window into a single task without the bucket pre-pass.
    // NULL keys and NULL times are included on both sides: NULL-key rows
    // group together under window partitioning (null-safe joins must keep
    // them), and the NULL-TIME right row must be dropped identically by
    // both paths (it has no as-of position — see leftAsOf's scaladoc).
    val left = (0 until 500).map { i =>
      val k = if (i >= 490) None
        else if (i < 450) Some(1L) else Some(1L + rnd.nextInt(10))
      val t = if (i >= 495) None else Some(rnd.nextInt(1000).toLong)
      (k, t, i.toLong)
    }.toDF("k", "t", "id")
    val right = ((0 until 600).map { _ =>
      val k = if (rnd.nextInt(10) < 9) Some(1L)
        else Some(1L + rnd.nextInt(10))
      (k, Some(rnd.nextInt(1000).toLong))
    } ++ Seq((None, Some(77L)), (Some(1L), None))).distinct.toDF("rk", "rt")
      .withColumn("payload", org.apache.spark.sql.functions.col("rt") * 3)
    for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(25L))) {
      val plain = AsOfJoin.leftAsOf(left, right, "k", "t", "rk", "rt",
          Seq("payload"), dir, tol).collect()
        .map(r => r.getAs[Long]("id") ->
          Option(r.get(r.fieldIndex("payload")))).toMap
      // width 64 over a 0..999 span → ~16 buckets per key
      val bucketed = AsOfJoin.leftAsOf(left, right, "k", "t", "rk", "rt",
          Seq("payload"), dir, tol, bucketWidth = Some(64L)).collect()
        .map(r => r.getAs[Long]("id") ->
          Option(r.get(r.fieldIndex("payload")))).toMap
      assert(bucketed.size === plain.size, s"$dir/$tol")
      plain.foreach { case (id, p) =>
        assert(bucketed(id) === p, s"$dir/$tol id=$id")
      }
    }
  }

  test("as-of against the fixtures matches a correlated-subquery oracle") {
    import spark.implicits._
    val ev = Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", $"ts").limit(200)
    val ord = Tables.load(spark, sf, "orders")
      .select($"o_custkey", $"o_orderdate")
    Tables.registerAll(spark, sf)
    ev.createOrReplaceTempView("ev200")
    val expected = spark.sql("""
      SELECT event_id,
        (SELECT max(o_orderdate) FROM orders
         WHERE o_custkey = user_id AND o_orderdate <= ts) AS match_date
      FROM ev200""").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val got = AsOfJoin.leftAsOf(ev, ord.distinct(), "user_id", "ts",
        "o_custkey", "o_orderdate", Seq("o_orderdate"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("o_orderdate"))))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, d) => assert(d === expected(id), s"event $id") }
  }

  test("randomized nearest-direction as-of matches an in-memory argmin " +
      "model, ties to the earlier match, tolerance bounds both sides") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (0 until 300).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(100).toLong, i.toLong)
    }
    val right = (0 until 400).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(100).toLong)
    }.distinct
    val l = left.toDF("k", "t", "id")
    val r = right.toDF("rk", "rt").withColumn("payload",
      org.apache.spark.sql.functions.col("rt"))
    val byKey = right.groupBy(_._1)
    for (tol <- Seq(None, Some(3L))) {
      val got = AsOfJoin.leftAsOfNearest(l, r, "k", "t", "rk", "rt",
          Seq("payload"), tolerance = tol).collect()
        .map(x => x.getAs[Long]("id") ->
          (Option(x.get(x.fieldIndex("payload"))),
           Option(x.get(x.fieldIndex("matched_delta")))))
        .toMap
      left.foreach { case (k, t, id) =>
        val cands = byKey.getOrElse(k, Seq.empty).map(_._2)
          .filter(rt => tol.forall(b => math.abs(rt - t) <= b))
        // argmin |Δ|, ties to the earlier (smaller rt)
        val expected = if (cands.isEmpty) None
          else Some(cands.minBy(rt => (math.abs(rt - t), rt)))
        assert(got(id)._1 === expected, s"tol=$tol key=$k t=$t")
        assert(got(id)._2 === expected.map(rt => math.abs(rt - t)),
          s"delta tol=$tol key=$k t=$t")
      }
    }
  }

  test("bucketed nearest as-of == single-pass nearest on a 90%-hot-key " +
      "fixture, with and without tolerance") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 90% of rows on key 1 — the hot-key shape the bucketed variant is for
    val left = (0 until 400).map { i =>
      val k = if (rnd.nextInt(10) == 0) 2L + rnd.nextInt(3) else 1L
      (k, rnd.nextInt(1000).toLong, i.toLong)
    }
    val right = (0 until 500).map { _ =>
      val k = if (rnd.nextInt(10) == 0) 2L + rnd.nextInt(3) else 1L
      (k, rnd.nextInt(1000).toLong)
    }.distinct
    val l = left.toDF("k", "t", "id")
    val r = right.toDF("rk", "rt").withColumn("payload",
      org.apache.spark.sql.functions.col("rt"))
    for (tol <- Seq(None, Some(7L))) {
      def norm(df: org.apache.spark.sql.DataFrame) = df
        .select("id", "payload", "matched_delta").collect()
        .map(x => x.getLong(0) ->
          (Option(x.get(1)), Option(x.get(2)))).toMap
      val plain = norm(AsOfJoin.leftAsOfNearest(l, r, "k", "t", "rk", "rt",
        Seq("payload"), tolerance = tol))
      val bucketed = norm(AsOfJoin.leftAsOfNearestBucketed(l, r, "k", "t",
        "rk", "rt", Seq("payload"), leftId = "id", tolerance = tol,
        bucketWidth = Some(50L)))
      assert(bucketed === plain, s"tol=$tol")
    }
  }
}
