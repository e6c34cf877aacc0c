package graft.demo
import org.apache.spark.sql.functions._
object TimeNgram {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.localBuilder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "time-ngram")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.queries.PipelineQueries.dedupNgram(spark, dir).count()
      println(f"run $i: rows=$n wall=${(System.nanoTime()-t0)/1e9}%.2f s")
      graft.operators.Dedup.unpersistAll()
    }
    spark.stop()
  }
}
