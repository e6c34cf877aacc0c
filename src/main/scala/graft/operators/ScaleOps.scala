package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Scale-hygiene building blocks: skew-salted aggregation, LSH bucket-size
  * guards, and partition sizing helpers. These exist for the 1000-executor
  * deployment story — a hot grouping key (one giant partition value) would
  * otherwise funnel into a single reducer, and a degenerate LSH bucket
  * (boilerplate/empty docs sharing a signature) would turn a bucket-local
  * self-join quadratic. */
object ScaleOps {

  // ------------------------------------------------- bucket-size guards

  private val obsId = new AtomicLong(0L)
  private val hookedSessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  /** Report nonzero bucket-guard drop metrics after each query that carries
    * one — piggybacks on `Dataset.observe`, so the counts come from the
    * actual execution with ZERO extra jobs (no eager pre-count pass over the
    * corpus). Registered at most once per session. */
  private def ensureDropListener(spark: SparkSession): Unit =
    if (hookedSessions.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_bucket_guard") && !row.isNullAt(0) &&
                row.getLong(0) > 0L)
              System.err.println(
                s"[graft.ScaleOps] $name: ${row.getLong(0)} rows in " +
                  s"over-cap buckets (largest bucket: ${row.getLong(1)})")
          }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
    }

  /** Drop every row belonging to a bucket (group of `keyCols`) larger than
    * `cap` — the guard that keeps a bucket-local self-join from going
    * quadratic on a degenerate hot bucket: with it, any single bucket
    * contributes at most cap·(cap−1)/2 candidate pairs, whatever the corpus
    * looks like. Dropped volume is observed (not silently truncated) and
    * printed by a session listener when nonzero.
    *
    * Cost shape: one `count` window over the bucket key — the shuffle it
    * introduces hash-partitions by exactly the key the downstream self-join
    * uses, so the exchange is reused, not added. */
  def capBuckets(df: DataFrame, keyCols: Seq[String], cap: Int,
                 tag: String): DataFrame = {
    require(cap > 0, s"bucket cap must be positive, got $cap")
    ensureDropListener(df.sparkSession)
    val name = s"graft_bucket_guard_${tag}_${obsId.incrementAndGet()}"
    df.withColumn("__bucket_n",
        count(lit(1)).over(Window.partitionBy(keyCols.map(col): _*)))
      .observe(name,
        coalesce(sum(when(col("__bucket_n") > cap, lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("rows_over_cap"),
        coalesce(max(col("__bucket_n")), lit(0L)).as("max_bucket"))
      .where(col("__bucket_n") <= cap)
      .drop("__bucket_n")
  }

  /** Keep at most `cap` rows per bucket — the ANN-side guard: unlike
    * [[capBuckets]] it degrades a hot bucket to a bounded sample instead of
    * removing it, so queries probing a dense region still get neighbors.
    * The sample order is a deterministic HASH of `orderCol` (tie-broken by
    * the column itself), not the raw column: a raw-id prefix would
    * systematically evict the largest ids — e.g. exactly the newest
    * documents — from every hot bucket, while the hash keeps an unbiased
    * cross-section. Truncated volume is observed and printed by the session
    * listener when nonzero. */
  def truncateBuckets(df: DataFrame, keyCols: Seq[String], orderCol: String,
                      cap: Int, tag: String): DataFrame = {
    require(cap > 0, s"bucket cap must be positive, got $cap")
    ensureDropListener(df.sparkSession)
    val name = s"graft_bucket_guard_${tag}_${obsId.incrementAndGet()}"
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(xxhash64(col(orderCol)), col(orderCol))
    df.withColumn("__bucket_rn", row_number().over(w))
      .observe(name,
        coalesce(sum(when(col("__bucket_rn") > cap, lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("rows_over_cap"),
        coalesce(max(col("__bucket_rn").cast("long")), lit(0L)).as("max_bucket"))
      .where(col("__bucket_rn") <= cap)
      .drop("__bucket_rn")
  }

  /** Two-phase salted count: groupBy(keys + salt) partial counts (spreads a
    * hot key over `saltBuckets` reducers), then groupBy(keys) sum. With AQE
    * skew handling this is often unnecessary; it is the explicit form for
    * deterministic layouts. Result ≡ plain groupBy(keys).count(). */
  def saltedCounts(df: DataFrame, keys: Seq[String], saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("count"))
  }

  /** Generic salted sum of `valueCol` by `keys` — same two-phase shape. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Top-frequency keys — the skew diagnosis query feeding a salting or
    * broadcast decision. */
  def hotKeys(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(topN)

  // ----------------------------------------------------- bloom prefilter

  /** A Bloom filter whose membership test is a pure Catalyst column —
    * `mightContain` compiles into whole-stage codegen (murmur3 `hash` +
    * array-literal bit test), so a prefilter sits INSIDE the scan stage
    * instead of breaking it with a UDF. Builder and probe derive bit
    * positions from the identical `hash(key, seed_i) mod numBits` formula
    * over the identical column type, which is what guarantees ZERO false
    * negatives: any prefilter built here may only pass extra rows, never
    * drop a true match, so `prefilter → exact join` ≡ `exact join`.
    *
    * The bit words travel inside the plan as an array literal — sized by
    * the *filter*, not the keys (numBits/64 longs; the default sizing is
    * ~1.2 MB per million keys at 1% fpp), the same payload a broadcast
    * variable would carry, minus the closure/UDF machinery. */
  final case class BloomColumn(bits: Array[Long], numBits: Int,
                               numHashes: Int) {
    private def pos(key: Column, i: Int): Column =
      pmod(hash(key, lit(i)), lit(numBits))
    def mightContain(key: Column): Column = {
      val bitsLit = lit(bits)
      (0 until numHashes).map { i =>
        val p = pos(key, i)
        call_function("shiftright",
          element_at(bitsLit, (p / 64).cast("int") + 1),
          pmod(p, lit(64)).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
      }.reduce(_ && _)
    }
  }

  /** Build a [[BloomColumn]] from a key column, fully distributed: each key
    * explodes to its `numHashes` bit positions, positions fold into 64-bit
    * words via a `bit_or` hash aggregate (map-side combine collapses
    * duplicates), and only the ≤ numBits/64 (wordIdx, word) rows reach the
    * driver — the collect is bounded by the FILTER size, never the key
    * count. Standard sizing: numBits = −n·ln(fpp)/ln²2, numHashes =
    * (m/n)·ln2 (Bloom '70). `keyCol` must have the same data type the
    * probe side will pass to `mightContain` — `hash` is type-sensitive. */
  def bloomFor(keys: DataFrame, keyCol: String, expectedItems: Long,
               fpp: Double = 0.01): BloomColumn = {
    require(expectedItems > 0, s"bad expectedItems $expectedItems")
    require(fpp > 0 && fpp < 1, s"bad fpp $fpp")
    val ln2 = math.log(2)
    val m0 = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    val numBits = math.min(m0.max(64), Int.MaxValue.toLong / 2).toInt
    val numHashes = math.max(1,
      math.round(numBits.toDouble / expectedItems * ln2).toInt)
    val posCols = (0 until numHashes)
      .map(i => pmod(hash(col(keyCol), lit(i)), lit(numBits)))
    val words = keys
      .select(explode(array(posCols: _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64))
          .cast("int")).as("b"))
      .groupBy(col("w")).agg(expr("bit_or(b)").as("word"))
      .collect()
    val arr = new Array[Long]((numBits + 63) / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    BloomColumn(arr, numBits, numHashes)
  }
}
