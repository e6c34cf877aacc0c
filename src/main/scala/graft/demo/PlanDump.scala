package graft.demo

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named contract queries (all of
  * them with no args) against a testdata dir — the plan-audit loop:
  * check broadcasts, pushed filters, WholeStageCodegen spans, and shuffle
  * placement without writing a throwaway main each time.
  *
  * Usage: runMain graft.demo.PlanDump [sfDir] [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.GraftSession.localBuilder(4, "graft-plandump")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(q) =>
          println(s"\n========== $n ==========")
          try println(q(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable =>
            println(s"[plandump] $n failed: ${e.getMessage}")
          }
        case None => println(s"[plandump] unknown query: $n")
      }
    }
    spark.stop()
  }
}
