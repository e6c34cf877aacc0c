package graft.demo

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Similarity

/** JOB-level wall attribution for the NN-descent graph build at gate scale
  * (r18 verdict #2 groundwork): at sf0.1 each nnd twin costs ~4.5 s while
  * shuffling single-digit MB, so the cost is per-job fixed overhead ×
  * job count, not bytes — this probe names every job the build submits
  * (count, seed checkpoint, per-round checkpoints, broadcast builds) with
  * its wall and gap-to-previous, so a job-economy change targets measured
  * jobs instead of guessed ones. Two timed builds (the second
  * post-JIT/post-page-cache) bracket the measurement.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.demo.NndJobProbe
  */
object NndJobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localBuilder(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "nnd-job-probe")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class J(id: Int, t0: Long, var t1: Long = -1L, desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String)]()
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .map(_.getProperty("spark.job.description")).filter(_ != null)
          .getOrElse("")
        jobs.put(js.jobId, (js.time, -1L, d.take(70)))
        jobStages.put(js.jobId, js.stageIds)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val p = jobs.get(je.jobId)
        if (p != null) jobs.put(je.jobId, (p._1, je.time, p._3))
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val dur = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stageInfo.put(si.stageId,
          f"dur=${dur / 1000.0}%5.2f run=${m.executorRunTime / 1000.0}%5.2f " +
            f"tasks=${si.numTasks}%3d ${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // pass 1: JIT + page cache warm
    Similarity.nnDescent(e, "vec_id", "embedding", k = 5).count()
    Thread.sleep(1000)
    jobs.clear()
    val t0 = System.nanoTime()
    val n = Similarity.nnDescent(e, "vec_id", "embedding", k = 5).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    import scala.jdk.CollectionConverters._
    val all = jobs.asScala.toSeq.sortBy(_._1)
    println(f"== nnDescent warm build: rows=$n wall=$wall%.2f s jobs=${all.size} ==")
    var prevEnd = -1L
    all.foreach { case (id, (s, t, d)) =>
      val gap = if (prevEnd < 0) 0L else s - prevEnd
      println(f"job $id%4d  wall=${(t - s) / 1000.0}%6.2f s  gap_before=${gap / 1000.0}%6.2f s  $d")
      if (t - s >= 300)
        jobStages.getOrDefault(id, Seq.empty).foreach { sid =>
          val si = stageInfo.get(sid)
          if (si != null) println(f"      stage $sid%4d  $si")
        }
      prevEnd = t
    }
    val jobWall = all.map { case (_, (s, t, _)) => math.max(0L, t - s) }.sum / 1000.0
    println(f"sum(job walls)=$jobWall%.2f s of $wall%.2f s — remainder is driver planning/gaps")
    spark.stop()
  }
}
