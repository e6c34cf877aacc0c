package graft.demo

/** Deterministic synthetic Gaussian embeddings (the LOW-locality hard case
  * for ANN experiments) — writes (vec_id, embedding) parquet. Usage:
  * runMain graft.demo.MakeSynthVec <out> <n> <dim>. */
object MakeSynthVec {
  def main(args: Array[String]): Unit = {
    val Array(out, nS, dimS) = args.take(3)
    val (n, dim) = (nS.toInt, dimS.toInt)
    val spark = graft.GraftSession.localBuilder(32, "graft-synthvec")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (0 until n).map { i =>
      val r = new scala.util.Random(i * 2654435761L + 11L)
      (i.toLong, Seq.fill(dim)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding").repartition(32)
      .write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
