package graft

/** Plan-audit main: dumps `explain("formatted")` for every query (or the
  * names passed as args) so physical-plan quality — pushdown, broadcast,
  * codegen spans, shuffle counts — can be reviewed per round.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1) match {
      case Array() => SparkEntry.queries.keys.toSeq.sorted
      case xs => xs.toSeq
    }
    val spark = GraftSession.create("graft-explain", "4")
    names.foreach { name =>
      println(s"\n================ $name ================")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // capture instead of df.explain so output interleaves with headers
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch {
        case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
