package graft.demo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.streaming.{NearDupIngest, SketchStreams}

/** End-to-end STREAMING corpus intake at scale: the near-dup ingest gate,
  * the Gopher quality filter, and the sketch corpus monitor composed as
  * one micro-batched pipeline (gate → filter → curated sink per batch via
  * the `onKept` hook; monitor as a streaming aggregation over the curated
  * output), driven by 5M synthetic documents — then the SAME composition
  * run in one batch pass, with curated-set and monitor-row equality
  * checked. Each stage was separately spec-proven (NearDupIngestSpec,
  * GopherRulesSpec, SketchStreamsSpec); this probes the COMPOSITION the
  * way a production intake job runs it.
  *
  * Synthetic shape: 2.5M distinct bases; ids 2.5M..5M−1 are exact
  * re-arrivals of base (id − 2.5M) under a NEW id, arriving in later
  * batches, so the gate's store path must drop all of them. 10% of bases
  * (base % 10 == 7) are junk (8 '#'-ridden words) that PASS the gate but
  * FAIL the Gopher rules — exercising the stage boundary. Every other
  * base is 24 words (2 Gopher stopwords + 22 base-unique fillers), so
  * distinct bases share no shingle mass and cannot collide as near-dups.
  *
  * Expected curated corpus: the 2.25M non-junk bases, identically from
  * the stream (10 × 500k batches) and the single batch pass.
  *
  * Usage: runMain graft.demo.CurationStreamProbe [nBase] */
object CurationStreamProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toLong).getOrElse(2500000L)
    require(nBase % 10 == 0, s"nBase must be a multiple of 10, got $nBase")
    val spark = graft.GraftSession.localBuilder(32, "graft-curationprobe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // doc text from its base id: junk bases are short + symbol-heavy
    // (fail word_count/symbol_ratio/stop_hits), clean bases carry 2
    // stopwords + 22 base-unique filler words (pass all rules at
    // minWords=20); filler ids of base b live in [23b, 23b+22) so no two
    // bases share a single filler word
    def text(base: org.apache.spark.sql.Column) =
      when(base % 10 === 7,
        concat(lit("# junk ### t"), base, lit(" ### ... # ## junk2")))
        .otherwise(concat(lit("the data of "),
          concat_ws(" ", transform(sequence(lit(0L), lit(21L)),
            k => concat(lit("t"),
              lpad((base * 23L + k).cast("string"), 8, "0"))))))
    def docsFor(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id").as("doc_id"),
        text(when(col("id") >= nBase, col("id") - nBase)
          .otherwise(col("id"))).as("text"))

    val root = java.nio.file.Files.createTempDirectory("graft_curation")
    val inDir = s"$root/in"
    // 10 batch files in arrival order: 5 of first-arrival bases, then 5 of
    // exact re-arrivals under new ids (mtime-ordered for the file source)
    val per = nBase / 5L
    (0 until 10).foreach { i =>
      docsFor(i * per, (i + 1) * per)
        .coalesce(4).write.parquet(s"$inDir/b$i")
      new java.io.File(s"$inDir/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(_.setLastModified(1000000000000L + i * 60000L))
    }
    println(s"[curationprobe] wrote ${2 * nBase} docs in 10 batch files")

    def curate(kept: DataFrame, outDir: String): Unit = {
      val good = kept.join(
        TextFunctions.gopherRules(kept, "doc_id", "text", minWords = 20)
          .where(col("keep")).select("doc_id"),
        "doc_id")
      good.write.mode("append").parquet(outDir)
      println(s"[curationprobe]   batch: kept=${kept.count()} " +
        s"curated=${good.count()}")
    }

    // ---- streaming composition: gate -> gopher -> curated sink ----
    val t0 = System.nanoTime()
    val gate = new NearDupIngest(s"$root/state_s", "doc_id", "text")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val q = gate.ingest(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true").parquet(inDir),
      s"$root/ckpt", kept => curate(kept, s"$root/curated_s"))
    q.awaitTermination()
    val wallS = (System.nanoTime() - t0) / 1e9
    // monitor leg as a true streaming aggregation over the curated corpus
    val mon = SketchStreams.corpusMonitor(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(s"$root/curated_s"),
      "text")
    val mq = mon.writeStream.format("memory").queryName("curation_monitor")
      .outputMode("complete")
      .option("checkpointLocation", s"$root/ckpt_mon")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    mq.awaitTermination()
    val monStream = spark.table("curation_monitor").collect().head
    val nStream = spark.read.parquet(s"$root/curated_s").count()
    println(f"[curationprobe] STREAM: $nStream curated docs in " +
      f"$wallS%.0f s (${2 * nBase / wallS}%.0f docs/s through the gate)")

    // ---- batch twin: one pass, same stages ----
    val t1 = System.nanoTime()
    val gateB = new NearDupIngest(s"$root/state_b", "doc_id", "text")
    gateB.processBatch(docsFor(0L, 2L * nBase), 0L,
      kept => curate(kept, s"$root/curated_b"))
    val monBatch = SketchStreams.corpusMonitor(
      spark.read.parquet(s"$root/curated_b"), "text").collect().head
    val wallB = (System.nanoTime() - t1) / 1e9
    val nBatch = spark.read.parquet(s"$root/curated_b").count()
    println(f"[curationprobe] BATCH: $nBatch curated docs in $wallB%.0f s")

    // ---- equality: curated sets and monitor sketches ----
    val diff = spark.read.parquet(s"$root/curated_s").select("doc_id")
      .exceptAll(spark.read.parquet(s"$root/curated_b").select("doc_id"))
      .unionAll(spark.read.parquet(s"$root/curated_b").select("doc_id")
        .exceptAll(spark.read.parquet(s"$root/curated_s").select("doc_id")))
      .count()
    val expected = nBase - nBase / 10  // bases with base % 10 != 7
    println(s"[curationprobe] curated set symmetric diff = $diff " +
      s"(expect 0); expected clean bases = $expected")
    assert(diff == 0L, "stream and batch curated sets must be identical")
    assert(nStream == expected, s"curated count $nStream != $expected")
    // monitor equality, per-sketch guarantee: KMV (order-free min-heap)
    // and KLL quantiles must match bit-for-bit; Misra–Gries guarantees
    // only items above the n/(k+1) deficit bound — the count-1 tail slots
    // of the summary are merge-order-dependent BY DESIGN, so equality is
    // asserted on the guaranteed heavy set (here: the 3 shared stopwords
    // at ~n/37 ≫ n/65 each), not the survivor tail
    def heavies(r: org.apache.spark.sql.Row): Set[(String, Long)] = {
      val nTok = 25L * nStream
      r.getSeq[org.apache.spark.sql.Row](1)
        .filter(_.getLong(1) >= nTok / 65 + 1)
        .map(h => (h.getString(0), h.getLong(1))).toSet
    }
    assert(monStream.getDouble(0) == monBatch.getDouble(0),
      s"KMV distinct estimate differs: ${monStream.getDouble(0)} vs " +
        s"${monBatch.getDouble(0)}")
    assert(monStream.getSeq[Double](2) == monBatch.getSeq[Double](2),
      "KLL length quantiles differ")
    val (hs, hb) = (heavies(monStream), heavies(monBatch))
    assert(hs.nonEmpty && hs == hb,
      s"guaranteed heavy-hitter set differs: $hs vs $hb")
    println(s"[curationprobe] monitor: distinct=${monStream.getDouble(0)} " +
      s"heavies=$hs quantiles=${monStream.getSeq[Double](2)}")
    println("[curationprobe] PASS: stream == batch across gate, filter, " +
      "and sketch monitor")

    // ---- restart leg: crash mid-stream AFTER a batch's state + curated
    // writes but BEFORE its checkpoint commit (the worst failure point),
    // then resume with a NEW gate instance over the same persisted state
    // dirs + checkpoint. The replayed batch's docs exact-Jaccard-hit their
    // own stored copies and drop, so the resumed run must converge to the
    // byte-identical curated set with zero duplicate appends.
    val t2 = System.nanoTime()
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    def inStream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true").parquet(inDir)
    val qr = new NearDupIngest(s"$root/state_r", "doc_id", "text")
      .ingest(inStream(), s"$root/ckpt_r", kept => {
        curate(kept, s"$root/curated_r")
        if (calls.incrementAndGet() == 4)
          throw new RuntimeException("injected mid-stream crash")
      })
    val died = try { qr.awaitTermination(); false }
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => true }
    assert(died && calls.get() == 4,
      s"crash leg must die on its 4th batch (got died=$died calls=${calls.get()})")
    println(s"[curationprobe] killed after batch 4 (state written, " +
      s"checkpoint uncommitted); resuming from $root/ckpt_r")
    val gateR2 = new NearDupIngest(s"$root/state_r", "doc_id", "text")
    gateR2.ingest(inStream(), s"$root/ckpt_r",
      kept => curate(kept, s"$root/curated_r")).awaitTermination()
    val wallR = (System.nanoTime() - t2) / 1e9
    val curR = spark.read.parquet(s"$root/curated_r")
    val diffR = curR.select("doc_id")
      .exceptAll(spark.read.parquet(s"$root/curated_s").select("doc_id"))
      .unionAll(spark.read.parquet(s"$root/curated_s").select("doc_id")
        .exceptAll(curR.select("doc_id"))).count()
    val dupR = curR.count() - curR.select("doc_id").distinct().count()
    val keptR = gateR2.kept(spark)
    val dupK = keptR.count() - keptR.select("doc_id").distinct().count()
    println(f"[curationprobe] RESTART: ${curR.count()} curated docs in " +
      f"$wallR%.0f s (crash+resume); diff vs uninterrupted = $diffR, " +
      f"duplicate curated rows = $dupR, duplicate kept rows = $dupK")
    assert(diffR == 0L, "resumed curated set must equal the uninterrupted run")
    assert(dupR == 0L && dupK == 0L,
      "batch replay after the crash must not duplicate state or output")
    println("[curationprobe] PASS: kill/resume converges to the identical " +
      "curated corpus with no duplicate state")
    spark.stop()
  }
}
