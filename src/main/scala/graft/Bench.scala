package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark: runs every contract query `SPARK_GRAFT_BENCH_ROUNDS`
  * times (default 3) and reports the per-query MEDIAN (plus min/max spread),
  * so one JIT hiccup or page-cache miss can't masquerade as a regression —
  * compare medians across rounds and only chase deltas that persist.
  * Signature caches are released between rounds so every round measures the
  * same (cold-cache) work. Emits ONE JSON line; `value` is the sum of
  * per-query medians. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup outside timing: JIT + codegen + parquet reader init
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try { spark.read.parquet(s"$sfDir/lineitem.parquet").count() }
    catch { case _: Throwable => () }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val samples = names.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    for (_ <- 1 to rounds) {
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        samples(name) += (System.nanoTime() - t0) / 1e9
      }
      // each round re-derives the dedup signature caches from scratch
      graft.operators.Dedup.unpersistAll()
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val med = names.map(n => n -> median(samples(n).toSeq)).toMap
    val qs = names.map(n => s"\"" + n + "\":" + med(n)).mkString("{", ",", "}")
    val spread = names.map { n =>
      val xs = samples(n)
      s"\"" + n + "\":[" + xs.min + "," + xs.max + "]"
    }.mkString("{", ",", "}")
    val total = med.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"runs":$rounds,"sf":"$sfDir"}""")
    spark.stop()
  }
}
