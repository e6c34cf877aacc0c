package graft.demo

import org.apache.spark.sql.functions._
import graft.queries.PipelineQueries
import graft.functions.minhashExprs

/** Routing-input probe for the r18 verification-shape gate: for each LSH
  * family (char-ngram 4×8/32 and word-minhash 16×4/64) at a given SF dir,
  * print the quantities the router weighs — side bytes, bucket rows,
  * Σ C(m,2) pair-candidate bound, Σ m·min(m−1,64) anchor bound, and the
  * predicted exchange bytes of the classic vs bucket-local shapes — so the
  * gate's decision boundary is set from measured numbers, not guesses. */
object ShapeGateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession.localBuilder(cpus, "shape-gate-probe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = PipelineQueries.docsWithPlants(spark, dir)

    def famProbe(tag: String, sh: org.apache.spark.sql.Column,
                 numHashes: Int, bands: Int, rows: Int): Unit = {
      val withSig = docs.select(col("doc_id").as("id"), sh.as("sh"))
        .withColumn("sig", minhashExprs.minhashSig(col("sh"), numHashes))
        .cache()
      val r = withSig.agg(count(lit(1)), coalesce(sum(size(col("sh"))), lit(0L))).head
      val n = r.getLong(0); val tot = r.getLong(1)
      val sideBytes = n * (numHashes * 8L + 32L) + tot * 8L
      val exploded = graft.operators.ScaleOps.capBuckets(
        withSig.select(col("id"),
            explode(graft.operators.Dedup.bandKeys(col("sig"), bands, rows)).as("bk"))
          .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey")),
        Seq("band", "bkey"), 1000, s"gate_$tag")
      val occ = exploded.groupBy("band", "bkey").agg(count(lit(1)).as("m"))
      val o = occ.agg(sum(col("m")).as("rows"),
        sum((col("m") * (col("m") - 1) / 2).cast("long")).as("pairBound"),
        sum(col("m") * least(col("m") - 1, lit(64L))).as("anchorBound")).head
      val bucketRows = o.getLong(0)
      val pairBound = o.getLong(1); val anchorBound = o.getLong(2)
      val avgSh = tot.toDouble / math.max(n, 1L)
      val rowW = (avgSh + numHashes) * 8 + 48
      println(f"[$tag] n=$n sideMB=${sideBytes / 1048576.0}%.1f " +
        f"bucketRows=$bucketRows pairBound=$pairBound anchorBound=$anchorBound " +
        f"classicPairGB=${pairBound * 2 * avgSh * 8 / 1e9}%.2f " +
        f"classicAnchorGB=${anchorBound * 2 * avgSh * 8 / 1e9}%.2f " +
        f"bucketLocalGB=${bucketRows * rowW / 1e9}%.2f")
      withSig.unpersist()
    }
    famProbe("ngram", minhashExprs.charShingleSet(col("text"), 3), 32, 4, 8)
    famProbe("minhash", minhashExprs.wordShingleSet(col("text"), 3), 64, 16, 4)
    spark.stop()
  }
}
