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
}
