package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Skew mitigation + bucketed co-located joins — the two shuffle-shaping
  * techniques the 100 TB design leans on (SURVEY.md §4 Spark counterparts).
  */
class SkewBucketSpec extends SparkSpec {

  test("salted aggregation equals the plain groupBy for any salt") {
    val ev = Tables.load(spark, sf, "events")
    val salted = Skew.saltedSumCount(ev, "event_type",
        col("value").cast("decimal(18,2)"), "sum_value",
        col("event_id"), buckets = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getDecimal(1), r.getLong(2)))).toMap
    val plain = ev.groupBy(col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getDecimal(1), r.getLong(2)))).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(s.compareTo(plain(k)._1) === 0, k)
      assert(n === plain(k)._2, k)
    }
  }

  test("salted join equals the plain join") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"))
    val dim = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = ev.join(dim, ev("user_id") === dim("c_custkey"))
      .select("event_id", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(ev, dim, "user_id", "c_custkey",
        col("event_id"), buckets = 8)
      .select("event_id", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
  }

  test("bucketed tables join without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    // session is shared — set the warehouse before first table write only
    val ord = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").option("path", s"$wh/ord_b")
      .saveAsTable("ord_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").option("path", s"$wh/li_b")
      .saveAsTable("li_b")
    try {
      val joined = spark.table("ord_b").join(spark.table("li_b"),
        col("o_orderkey") === col("l_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: the join itself needs no Exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() === li.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS ord_b")
      spark.sql("DROP TABLE IF EXISTS li_b")
    }
  }
}
