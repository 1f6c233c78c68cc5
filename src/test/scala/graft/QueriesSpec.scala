package graft

/** Registry-level guards: every declared query must build and run at
  * sf0.001 (catches object-init and analysis errors that per-operator
  * specs can miss), and the oracle map must stay consistent with the
  * query map.
  */
class QueriesSpec extends SparkSpec {

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without queries: $extra")
  }

  test("every query runs at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** q26 is the one rows-only CORRECTNESS entry (Spark's HLL++ estimate
    * can't bit-match DuckDB's sketch) — this is its quantitative gate:
    * relative error < 5% (the sketch's documented default rsd) against
    * the exact q09 distinct counts at sf0.01. HLL++ is deterministic per
    * input, so this is a stable assertion, not a flaky statistical one —
    * an estimator regression (precision drop, wrong column, wrong
    * rollup) shows up as a fixed reproducible violation.
    */
  test("q26 approx distincts are within 5% of the exact counts (sf0.01)") {
    val dir = "/root/testdata/sf0.01"
    val a = SparkEntry.queries("q26_approx_distinct")(spark, dir).collect()(0)
    val e = SparkEntry.queries("q09_distinct")(spark, dir).collect()(0)
    def check(approx: Long, exact: Long, what: String): Unit =
      assert(math.abs(approx - exact) <= 0.05 * exact,
        s"$what: approx $approx vs exact $exact exceeds 5% relative error")
    check(a.getAs[Long]("approx_parts"), e.getAs[Long]("n_parts"), "parts")
    check(a.getAs[Long]("approx_orders"), e.getAs[Long]("n_orders"), "orders")
    // the in-query exact twin must agree with q09 exactly
    assert(a.getAs[Long]("exact_parts") === e.getAs[Long]("n_parts"))
  }
}
