package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Headroom probe: unions sf0.1 inputs 10x (≈ sf1: 6M lineitem rows, 50k
  * docs) and times the core aggregation, join, and LSH-dedup paths — checks
  * the plans survive a 10x scale-up with sublinear-to-linear wall-clock. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.localBuilder(32, "graft-scaleprobe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def x10(name: String, idCol: String) = {
      val base = spark.read.parquet(s"$dir/$name.parquet")
      (0 until 10).map(i => base.withColumn(idCol,
          col(idCol) + lit(i.toLong * 100000000L)))
        .reduce(_ unionByName _)
    }
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val li = x10("lineitem", "l_orderkey")
    time("q1-agg over 6M rows") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")), count(lit(1)))
        .count()
    }
    val docs = x10("documents", "doc_id")
    time("minhash LSH dedup over 50k docs") {
      graft.operators.Dedup.minhashPairs(docs, "doc_id", "text").count()
    }
    time("connected components + keep-list over 50k docs") {
      val pairs = graft.operators.Dedup.minhashPairs(docs, "doc_id", "text")
      graft.operators.Dedup.keepList(docs, "doc_id", pairs).count()
    }
    val emb = x10("embeddings", "vec_id")
    time("knn brute-force 10 queries x 50k corpus") {
      graft.operators.Similarity.bruteForceTopK(
        emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", 5).count()
    }
    time("knn IVF (nlist=64, nprobe=8) 10 queries x 50k corpus") {
      graft.operators.Similarity.ivfTopK(
        emb.where(col("vec_id") < 10), emb, "vec_id", "embedding", 5,
        nlist = 64, nprobe = 8).count()
    }
    time("chunk plan over 50k docs") {
      graft.operators.CorpusOps.chunkPlan(docs, "doc_id", "text", 32).count()
    }
    time("sequence packing over 50k docs (256 groups)") {
      graft.operators.CorpusOps.packSequences(
        docs.select(col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 256, numGroups = 256).count()
    }
    time("tf-idf top-3 over 50k docs") {
      graft.operators.CorpusOps.tfIdfTopTerms(docs, "doc_id", "text", 3).count()
    }
    // adversarial corpus: 100k IDENTICAL documents — without the bucket
    // guard every band bucket holds all 100k docs and the self-join emits
    // ~10^10 candidate pairs; with it the probe must complete in seconds
    // with zero pairs (exact dedup owns identical docs)
    val blob = spark.range(100000L).select(col("id").as("doc_id"),
      lit("identical boilerplate text repeated across the entire corpus " +
        "to form one degenerate lsh bucket").as("text"))
    time("DEGENERATE: minhash LSH over 100k identical docs (bucket guard)") {
      graft.operators.Dedup.minhashPairs(blob, "doc_id", "text").count()
    }
    time("DEGENERATE: simhash LSH over 100k identical docs (bucket guard)") {
      graft.operators.Dedup.simhashPairs(blob, "doc_id", "text").count()
    }
    graft.operators.Dedup.unpersistAll()
    spark.stop()
  }
}
