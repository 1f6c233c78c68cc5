package graft

import org.apache.spark.sql.execution.FormattedMode

/** Scratch plan dumper for iterating on PlanSpec expectations. */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("probe", "8")
    args.foreach { name =>
      println(s"==== $name ====")
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      println(df.queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
