package graft.demo

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Sampling}
import graft.queries.PipelineQueries

/** Retry-determinism probe (r14 verdict item 7): the engine's md5-pure
  * convention (splits / samples / shuffles / packings are pure functions of
  * (seed, id), never of partition layout, attempt numbers, or RNG state)
  * should make every contract entry byte-identical when tasks are
  * speculatively duplicated or fail and re-run. Prove it two ways:
  *
  * Leg A — SPECULATION: a session at `local[32,4]` with speculation forced
  * hot (quantile 0, multiplier 1.0 ⇒ Spark re-launches a duplicate of any
  * task slower than its stage median; first finisher wins, losers are
  * killed mid-write) runs the 13 nondeterminism-sensitive contract entries
  * at sf0.1 and diffs each result against the SAME entry in a clean
  * no-speculation run (both hashed as sorted row strings). Any operator
  * that leaked attempt-dependent state would differ.
  *
  * Leg B — FAILURE + RECOMPUTE: the same operators run with a die-once
  * input: a mapPartitions wrapper that throws on (partition 1, attempt 0),
  * forcing a real task failure, retry, and upstream lineage recompute.
  * Output must equal the un-wrapped run bit for bit. (`local[32,4]` = 4
  * task-failure tolerance; the default local master fails the job on the
  * first task failure, which is why the bench/verify mains never see
  * retries — production clusters always do.)
  *
  * Usage: runMain graft.demo.RetryProbe [sfDir] (default sf0.1). */
object RetryProbe {
  private val Entries = Seq(
    "train_shuffle", "weighted_sample", "diverse_sample", "pack_plan",
    "pack_stats", "kmeans_assign", "stratified_sample", "unimax_sample",
    "token_budget_sample", "hash_split", "leak_safe_split",
    "quality_budget", "quality_floor")

  private def hashOf(df: DataFrame): String = {
    val rows = df.collect().map(_.toString).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Throws once on (partition 1, attempt 0) — a real task failure that
    * forces retry + upstream recompute — then streams rows unchanged. */
  private def dieOnce(df: DataFrame, tag: String): DataFrame = {
    val schema = df.schema
    df.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() == 1 && tc.attemptNumber() == 0)
        throw new RuntimeException(s"injected die-once [$tag]")
      it
    }(Encoders.row(schema))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")

    def session(speculate: Boolean): SparkSession = {
      var b = SparkSession.builder()
        .master(if (speculate) "local[32,4]" else "local[32]")
        .appName(s"graft-retryprobe-spec$speculate")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      b = graft.GraftSession.scaleConf(32, shufflePartitions = 32)
        .foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
      if (speculate) b = b.config("spark.speculation", "true")
        .config("spark.speculation.quantile", "0.0")
        .config("spark.speculation.multiplier", "1.0")
      val s = b.getOrCreate()
      graft.GraftFunctions.register(s)
      s
    }

    // ---- clean pass: reference hashes ----
    var spark = session(speculate = false)
    spark.sparkContext.setLogLevel("ERROR")
    val clean = Entries.map { n =>
      n -> hashOf(graft.SparkEntry.queries(n)(spark, sfDir))
    }.toMap
    spark.stop()

    // ---- leg A: speculation-hot + failure-tolerant session ----
    spark = session(speculate = true)
    spark.sparkContext.setLogLevel("ERROR")
    var diffs = 0
    for (n <- Entries) {
      val h = hashOf(graft.SparkEntry.queries(n)(spark, sfDir))
      val same = h == clean(n)
      if (!same) diffs += 1
      println(s"[retryprobe] A spec=$n match=$same")
    }

    // ---- leg B: die-once failure injection on the operator inputs ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"), col("lang"),
        col("n_chars"))
    val toks = docs.select(col("doc_id"), col("source"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      (col("n_chars") % 97).cast("double").as("quality"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "hashSplit" -> (d => Sampling.hashSplit(d, "doc_id")),
      "stratifiedHashSample" ->
        (d => Sampling.stratifiedHashSample(d, "doc_id", "lang",
          Map("en" -> 0.25), defaultRate = 0.5)),
      "weightedSample" ->
        (d => Sampling.weightedSample(d.where(col("n_tokens") > 0),
          "doc_id", "n_tokens", n = 500)),
      "unimaxSample" ->
        (d => Sampling.unimaxSample(d, "doc_id", "lang", budget = 1000L)),
      "tokenBudgetSample" ->
        (d => Sampling.tokenBudgetSample(d, "doc_id", "n_tokens", 50000L)),
      "qualityFloor" ->
        (d => Sampling.qualityFloor(d, "doc_id", "source", "quality", 0.5)))
    for ((name, op) <- ops) {
      val base = hashOf(op(toks))
      val injected = hashOf(op(dieOnce(toks, name)))
      val same = base == injected
      if (!same) diffs += 1
      println(s"[retryprobe] B die-once=$name match=$same")
    }
    // the two embedding-space ops run on the vectors table
    val embOps: Seq[(String, DataFrame => DataFrame)] = Seq(
      "kmeansAssign" ->
        (d => Clustering.kmeansAssign(d, "vec_id", "embedding", k = 8)),
      "diverseSample" ->
        (d => Clustering.diverseSample(d, "vec_id", "embedding",
          k = 8, quota = 12)))
    for ((name, op) <- embOps) {
      val base = hashOf(op(emb))
      val injected = hashOf(op(dieOnce(emb, name)))
      val same = base == injected
      if (!same) diffs += 1
      println(s"[retryprobe] B die-once=$name match=$same")
    }
    println(s"[retryprobe] RESULT diffs=$diffs " +
      s"(entriesA=${Entries.size} opsB=${ops.size + embOps.size})")
    spark.stop()
    if (diffs > 0) sys.exit(1)
  }
}
