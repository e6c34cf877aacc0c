package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.{minhashExprs, TextFunctions}
import graft.operators.{Dedup, ScaleOps}

/** Streaming NEAR-duplicate corpus ingestion — the incremental form of
  * [[graft.operators.Dedup.minhashPairs]]: documents arrive in micro-batches
  * and a doc is kept only if no already-ingested (or earlier-in-batch) doc
  * is a verified MinHash near-duplicate of it. The exact streaming dedup
  * ([[EventStreams.dedupStream]]) drops byte-identical re-arrivals; this
  * drops NEAR-copies, which is what a crawl re-ingest actually produces.
  *
  * Mechanics (foreachBatch — the stream-static-join + upsert production
  * pattern): the dedup state is two append-only parquet tables under
  * `stateDir` — `bands` (band, bkey, id) and `sigs` (id, sig) — holding
  * the LSH band keys and MinHash signatures of every KEPT doc. Each batch:
  *
  *  1. shingle set + signature + band keys for the batch's docs (the same
  *     fused kernels as the batch operator);
  *  2. store hits: batch docs sharing any band bucket with a stored doc,
  *     verified EXACTLY like the batch operator's two-stage check —
  *     signature-estimate ≥ threshold − 0.2 as the recall-preserving
  *     PREFILTER, then exact shingle-set Jaccard ≥ threshold as the
  *     decision (the stored shingle sets live in the state table for
  *     this) — candidate-level collisions alone don't drop, and neither
  *     does a sub-threshold estimate alone;
  *  3. within-batch: band self-join candidates, same two-stage
  *     verification; the smallest id of each verified near-dup group
  *     survives (first-wins, non-recursive: a doc drops iff a verified
  *     SMALLER candidate or a store hit exists — conservative when that
  *     smaller doc itself drops, and deterministic);
  *  4. survivors' text appends to `kept`, their bands/sigs/shingles append
  *     to the state tables.
  *
  * State is bounded by KEPT docs (each contributes `bands` rows + one
  * 64-long signature + its distinct word-3-shingle hash set, ∝ kept
  * tokens — the same order as the kept text itself), not by stream volume
  * — re-ingested duplicates add nothing. At 100 TB the state tables are ordinary relations: the
  * band-key join is an equi-join a real deployment would back with a Delta
  * table compacted by [[graft.operators.Maintenance.optimize]]; the
  * per-batch work is one broadcast-or-shuffle join per state table, no
  * driver-side state, no all-pairs stage. Exactly-once: foreachBatch can
  * re-run a batch on failure — production would write state through the
  * atomic commit claims of [[graft.deltalog.DeltaFixtureWriter]]
  * (idempotent by batchId); the parquet-append form here keeps the test
  * surface minimal and the mechanics identical.
  */
final class NearDupIngest(
    stateDir: String, idCol: String, textCol: String,
    numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.7,
    bucketCap: Int = 1000)
    extends Serializable {
  require(numHashes % bands == 0,
    s"bands ($bands) must divide numHashes ($numHashes)")
  private val rowsPerBand = numHashes / bands

  private def bandsDir = s"$stateDir/bands"
  private def sigsDir = s"$stateDir/sigs"
  def keptDir = s"$stateDir/kept"

  private val bandSchema = StructType(Seq(
    StructField("band", IntegerType), StructField("bkey", LongType),
    StructField("sid", LongType)))
  private val sigSchema = StructType(Seq(
    StructField("sid", LongType),
    StructField("ssig", ArrayType(LongType, containsNull = false)),
    StructField("ssh", ArrayType(LongType, containsNull = false))))

  private def readOr(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    if (new java.io.File(dir).exists()) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** One micro-batch through the near-dup gate; also directly usable as a
    * batch-mode incremental ingest step.
    *
    * `onKept` is the downstream-composition hook: it receives this batch's
    * SURVIVORS (idCol, textCol) while they are still cached, so a curation
    * pipeline can chain its next stages (quality/Gopher filters, sketch
    * monitors, curated sinks) per micro-batch without re-reading `keptDir`
    * or guessing which rows a batch appended. */
  def processBatch(batch: DataFrame, batchId: Long,
                   onKept: DataFrame => Unit = _ => ()): Unit = {
    val spark = batch.sparkSession
    // EXACT within-batch dedup first (keep-min-id per normalized-text md5,
    // one hash aggregation): a degenerate batch of identical docs must not
    // reach the band self-join, whose bucket cap would otherwise skip the
    // oversized buckets and wave every copy through — the same division of
    // labor as the batch operator (exactTextGroups catches identical text,
    // the LSH cap only ever drops what exact dedup already handles)
    val withSig = Dedup.dedupKeepMin(
        batch.select(col(idCol).cast("long").as("id"),
          col(textCol).as("text"),
          TextFunctions.fingerprintMd5(col(textCol)).as("__fp")),
        "id", Seq("__fp"))
      .drop("__fp")
      .withColumn("sh", minhashExprs.wordShingleSet(col("text"), 3))
      .withColumn("sig", minhashExprs.minhashSig(col("sh"), numHashes))
      .cache()
    try {
      val bnd = withSig.select(col("id"),
          explode(Dedup.bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))

      val storeBands = readOr(spark, bandsDir, bandSchema)
      val storeSigs = readOr(spark, sigsDir, sigSchema)
      // two-stage verification, IDENTICAL semantics to the batch operator
      // (Dedup.verifiedPairs): the −0.2 estimate margin is only the
      // recall-preserving PREFILTER; the drop decision is exact shingle-set
      // Jaccard ≥ threshold. Gating on the estimate alone would silently
      // lower the effective threshold by the margin (≈0.5 at the default
      // 0.7) and permanently discard merely-related documents.
      def exactJaccard(a: Column, b: Column): Column = {
        val inter = minhashExprs.sortedIntersectCount(a, b)
        when(size(a) + size(b) - inter === 0, 0.0)
          .otherwise(inter.cast("double") / (size(a) + size(b) - inter))
      }
      def prefilter(sa: Column, sb: Column): Column =
        minhashExprs.arrayAgreeCount(sa, sb).cast("double") / numHashes >=
          threshold - 0.2
      val storeHits = bnd.join(storeBands, Seq("band", "bkey"))
        .select(col("id"), col("sid")).distinct()
        .join(withSig.select(col("id"), col("sig"), col("sh")), Seq("id"))
        .join(storeSigs, Seq("sid"))
        .where(prefilter(col("sig"), col("ssig")))
        .where(exactJaccard(col("sh"), col("ssh")) >= threshold)
        .select(col("id")).distinct()

      // oversized band buckets are dropped from the SELF-join only (the
      // exact prefilter above already removed identical text, so a huge
      // bucket is adversarial near-identical spam — same guard +
      // drop-metrics as the batch operator); the store-membership check
      // stays uncapped so nothing sneaks past the already-kept corpus
      val capped = ScaleOps.capBuckets(bnd, Seq("band", "bkey"),
        bucketCap, "ingest").cache()
      val a = capped.alias("a"); val b = capped.alias("b")
      val sigOf = withSig.select(col("id"), col("sig"), col("sh"))
      val batchLosers = a.join(b,
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
        .join(sigOf.select(col("id").as("id_a"), col("sig").as("sig_a"),
          col("sh").as("sh_a")), "id_a")
        .join(sigOf.select(col("id").as("id_b"), col("sig").as("sig_b"),
          col("sh").as("sh_b")), "id_b")
        .where(prefilter(col("sig_a"), col("sig_b")))
        .where(exactJaccard(col("sh_a"), col("sh_b")) >= threshold)
        .select(col("id_b").as("id")).distinct()

      // EAGER localCheckpoint, not cache: appending to sigsDir/bandsDir
      // below invalidates any cached plan that READS those dirs (Spark
      // refreshes path-dependent caches on write), and a recompute after
      // the appends would see this batch's own sigs/bands in the store —
      // every doc then "hits" itself and the batch silently evaluates to
      // empty for late consumers (the onKept hook; plus a hidden full
      // recompute between the state writes). Checkpointing cuts the
      // lineage to the state dirs, so the survivors are computed exactly
      // once and stay stable through the appends.
      val kept = withSig
        .join(storeHits.union(batchLosers).distinct(), Seq("id"), "left_anti")
        .localCheckpoint(true)

      kept.select(col("id").as(idCol), col("text").as(textCol))
        .write.mode("append").parquet(keptDir)
      kept.select(col("id").as("sid"), col("sig").as("ssig"),
          col("sh").as("ssh"))
        .write.mode("append").parquet(sigsDir)
      kept.select(col("id"),
          explode(Dedup.bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
        .select(col("bk.band").as("band"), col("bk.bkey").as("bkey"),
          col("id").as("sid"))
        .write.mode("append").parquet(bandsDir)
      onKept(kept.select(col("id").as(idCol), col("text").as(textCol)))
      capped.unpersist()
    } finally withSig.unpersist()
  }

  /** Drive a document stream through the gate until no more input is
    * available (Trigger.AvailableNow — the incremental-ingest-job shape).
    * `onKept` composes downstream per-batch stages (see [[processBatch]]). */
  def ingest(stream: DataFrame, checkpointDir: String,
             onKept: DataFrame => Unit = _ => ()): StreamingQuery =
    stream.writeStream
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id, onKept))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** The corpus that survived ingestion so far. */
  def kept(spark: SparkSession): DataFrame =
    readOr(spark, keptDir, StructType(Seq(
      StructField(idCol, LongType), StructField(textCol, StringType))))
}
