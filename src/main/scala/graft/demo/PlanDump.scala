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
    // --exec: run each query first and dump the FINAL plan, i.e. after
    // AQE's runtime re-planning (static plans show SortMergeJoins that
    // AQE converts to broadcast once the built side's true size is known)
    val exec = args.contains("--exec")
    val rest = args.filterNot(_ == "--exec")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchQueries
    val names = if (rest.length > 1) rest.drop(1).toSeq
      else all.keys.toSeq.sorted
    val spark = graft.GraftSession.localBuilder(4, "graft-plandump")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      all.get(n) match {
        case Some(q) =>
          println(s"\n========== $n ==========")
          try {
            val df = q(spark, sfDir)
            if (exec) df.count()
            println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
          } catch { case e: Throwable =>
            println(s"[plandump] $n failed: ${e.getMessage}")
          }
        case None => println(s"[plandump] unknown query: $n")
      }
    }
    spark.stop()
  }
}
