package graft

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Sampling}

/** Injection counter: a plain JVM static, NOT an accumulator — Spark
  * discards accumulator updates from failed task attempts (correctly: they
  * would double-count on retry), which is exactly the attempt this spec
  * needs to observe. Tests run in local mode, so tasks share the driver
  * JVM and a static is visible. */
object RetryDeterminismSpec {
  val fires = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** Pins the retry-determinism contract in CI (r14 verdict item 7): the
  * engine's md5-pure convention — splits / samples / packings are pure
  * functions of (seed, id), never of partition layout, attempt numbers, or
  * RNG state — must make outputs byte-identical when a task fails and is
  * recomputed. This spec injects a REAL task failure (throw on partition 1,
  * attempt 0 → Spark retries the task and recomputes upstream lineage; the
  * shared session runs `local[4,2]` so the job survives) and asserts the
  * result hash equals the clean run's. The full 21-operator sweep incl. a
  * speculation-hot session lives in `graft.demo.RetryProbe` (sf0.1, diff 0,
  * recorded in BASELINE.md round 15); this spec keeps the invariant from
  * regressing silently at test cost.
  */
class RetryDeterminismSpec extends SparkSuite {

  private def hashOf(df: DataFrame): String = {
    val rows = df.collect().map(_.toString).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Throws once on (partition 1, attempt 0) then streams rows unchanged;
    * bumps the static fire counter so the test can assert the failure
    * actually happened (a 1-partition input would otherwise test nothing). */
  private def dieOnce(df: DataFrame): DataFrame = {
    val schema = df.schema
    df.mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() == 1 && tc.attemptNumber() == 0) {
        RetryDeterminismSpec.fires.incrementAndGet()
        throw new RuntimeException("injected die-once")
      }
      it
    }(Encoders.row(schema))
  }

  // ≥2 partitions so partition 1 exists (a single sf0.001 parquet file can
  // scan as one partition); hash-repartition is itself layout-deterministic
  private lazy val toks = table("documents")
    .select(col("doc_id"), col("source"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      (col("n_chars") % 97).cast("double").as("quality"))
    .repartition(4, col("doc_id"))

  private lazy val emb = table("embeddings").repartition(4, col("vec_id"))

  private val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
    "hashSplit" -> (d => Sampling.hashSplit(d, "doc_id")),
    "weightedSample" -> (d =>
      Sampling.weightedSample(d.where(col("n_tokens") > 0),
        "doc_id", "n_tokens", n = 50)),
    "tokenBudgetSample" -> (d =>
      Sampling.tokenBudgetSample(d, "doc_id", "n_tokens", 5000L)),
    "qualityFloor" -> (d =>
      Sampling.qualityFloor(d, "doc_id", "source", "quality", 0.5)))

  for ((name, op) <- ops) {
    test(s"$name is byte-identical under a real task failure + retry") {
      val clean = hashOf(op(toks))
      val before = RetryDeterminismSpec.fires.get()
      val retried = hashOf(op(dieOnce(toks)))
      assert(RetryDeterminismSpec.fires.get() > before,
        "injection never fired — input had <2 partitions?")
      assert(retried === clean)
    }
  }

  test("kmeansAssign is byte-identical under a real task failure + retry") {
    val clean = hashOf(Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 4))
    val before = RetryDeterminismSpec.fires.get()
    val retried = hashOf(
      Clustering.kmeansAssign(dieOnce(emb), "vec_id", "embedding", k = 4))
    assert(RetryDeterminismSpec.fires.get() > before)
    assert(retried === clean)
  }
}
