package graft.demo

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity

/** Stage-level shuffle attribution for the NN-descent graph build (r16
  * verdict #4 groundwork): which stages of `knn_graph_nnd` actually carry
  * the 563 MB sf1 shuffle? Captures per-stage shuffle WRITE bytes + row
  * counts + the stage's callsite name, prints them sorted by bytes, so the
  * packed-state redesign targets measured bytes instead of guessed ones.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.demo.NndShuffleProbe
  */
object NndShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1")
    val spark = GraftSession.localBuilder(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "nnd-shuffle-probe")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(90),
          m.shuffleWriteMetrics.bytesWritten,
          m.shuffleWriteMetrics.recordsWritten,
          m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead))
      }
    })
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val t0 = System.nanoTime()
    val g = Similarity.nnDescent(e, "vec_id", "embedding", k = 10)
    val nRows = g.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // drain listener bus
    import scala.jdk.CollectionConverters._
    val all = stages.asScala.toSeq
    val totW = all.map(_._3).sum / 1048576.0
    println(f"== nnDescent sf=$sfDir rows=$nRows wall=$wall%.1f s shuffleWriteTotal=$totW%.1f MB ==")
    all.sortBy(-_._3).take(30).foreach { case (id, name, w, recs, r) =>
      println(f"stage $id%4d  write=${w / 1048576.0}%8.1f MB  rows=$recs%10d  read=${r / 1048576.0}%8.1f MB  $name")
    }
    spark.stop()
  }
}
