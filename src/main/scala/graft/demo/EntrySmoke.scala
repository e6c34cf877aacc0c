package graft.demo

import org.apache.spark.sql.SparkSession

/** Smoke for the driver's entry() contract. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    df.show(1, 200, vertical = true)
    println(s"entry rows = ${df.count()}")
    spark.stop()
  }
}
