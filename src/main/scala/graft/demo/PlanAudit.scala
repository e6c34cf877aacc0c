package graft.demo

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans of the core queries for scale review:
  * check PushedFilters / ReadSchema pruning, broadcast joins, and
  * WholeStageCodegen spans. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val targets = args.headOption.map(_.split(",").toSeq).getOrElse(
      Seq("q1_agg", "join_revenue_by_nation", "anti_join_orphans", "skewness_metrics"))
    targets.foreach { name =>
      println(s"########## $name")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
