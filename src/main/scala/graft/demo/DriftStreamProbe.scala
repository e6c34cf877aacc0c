package graft.demo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.DriftStreams

/** The drift monitor run the way its docblock sells it — "the drift alarm
  * of a recurring-crawl ingest pipeline" — at the scale its streaming
  * siblings (NearDupIngest, CurationStreamProbe) earned: 5M documents in
  * 10 micro-batches with a planted distribution shift injected mid-stream,
  * asserting (a) the alarm fires on EXACTLY the injection batch, (b) no
  * false alarm fires before it on any source, and (c) the final streamed
  * state equals the batch operator over the union — through both the
  * literal-reference route and [[DriftStreams.driftMonitorJoined]].
  *
  * Synthetic shape: 4 sources × 8 tokens/doc drawn xxhash-uniform from a
  * 1000-token vocabulary (per-group streamed vocab 1000–2000 ≪ k = 4096,
  * the exact-MG contract regime). The reference profile is 500k docs of
  * the clean generator. From batch 7 onward source C's tokens move to a
  * DISJOINT 1000-token range — batches 0-6 measure sampling noise
  * (js ~1e-3), batch 7+ measures real drift through the cumulative state.
  *
  * Usage: runMain graft.demo.DriftStreamProbe [nPerBatch] */
object DriftStreamProbe {
  def main(args: Array[String]): Unit = {
    val per = args.headOption.map(_.toLong).getOrElse(500000L)
    val nBatches = 10
    val driftFrom = 7 * per  // ids >= this: source C's vocabulary shifts
    val alarmThreshold = 0.02
    val spark = graft.GraftSession.localBuilder(32, "graft-driftprobe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sources = array(lit("A"), lit("B"), lit("C"), lit("D"))
    def docsFor(lo: Long, hi: Long, drifted: Boolean): DataFrame = {
      val src = element_at(sources, (col("id") % 4 + 1).cast("int"))
      def tok(k: Int) = {
        val idx = pmod(xxhash64(col("id"), lit(k)), lit(1000)).cast("string")
        if (drifted)
          when(src === "C" && col("id") >= driftFrom,
            concat(lit("v"), idx)).otherwise(concat(lit("w"), idx))
        else concat(lit("w"), idx)
      }
      spark.range(lo, hi).select(
        src.as("source"),
        concat_ws(" ", (0 until 8).map(tok): _*).as("text"))
    }

    // reference profile: 500k docs of the clean generator (the "curated
    // snapshot" the monitor was built against)
    val ref = docsFor(0L, 500000L, drifted = false)

    val root = java.nio.file.Files.createTempDirectory("graft_driftprobe")
    val inDir = s"$root/in"
    (0 until nBatches).foreach { i =>
      docsFor(i * per, (i + 1) * per, drifted = true)
        .coalesce(4).write.parquet(s"$inDir/b$i")
      new java.io.File(s"$inDir/b$i").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(_.setLastModified(1000000000000L + i * 60000L))
    }
    println(s"[driftprobe] wrote ${nBatches * per} docs in $nBatches batches" +
      s" (source C shifts vocabulary from batch 7)")

    val schema = StructType(Seq(StructField("source", StringType),
      StructField("text", StringType)))
    // per-micro-batch capture: complete mode re-emits the full monitor
    // table each trigger; record every source's js trajectory
    val trajectory =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Map[String, Double])]
    val t0 = System.nanoTime()
    val q = DriftStreams.driftMonitor(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "4")
          .option("pathGlobFilter", "*.parquet")
          .option("recursiveFileLookup", "true").parquet(inDir),
        ref, "source", "text")
      .writeStream.outputMode("complete")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (df: DataFrame, id: Long) =>
        val m = df.collect()
          .map(r => r.getString(0) -> r.getDouble(3)).toMap
        trajectory.synchronized { trajectory += ((id, m)) }
        println(s"[driftprobe]   batch $id: " + m.toSeq.sorted
          .map { case (g, js) => f"$g=$js%.4f" }.mkString(" "))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val wallS = (System.nanoTime() - t0) / 1e9
    println(f"[driftprobe] STREAM: ${nBatches * per} docs in $wallS%.0f s " +
      f"(${nBatches * per / wallS}%.0f docs/s)")

    // (a) the alarm fires on exactly the injection batch for C...
    val alarms = trajectory.sortBy(_._1)
      .map { case (id, m) => (id, m.getOrElse("C", 0.0)) }
    val firstAlarm = alarms.collectFirst {
      case (id, js) if js > alarmThreshold => id }
    println(s"[driftprobe] first C alarm at batch $firstAlarm " +
      s"(threshold $alarmThreshold); injection batch 7")
    assert(firstAlarm.contains(7L),
      s"alarm must fire first on the injection batch: $alarms")
    // ...(b) and never for the undrifted sources
    val maxClean = trajectory.flatMap(_._2.collect {
      case (g, js) if g != "C" => js }).max
    println(f"[driftprobe] max undrifted-source js = $maxClean%.5f")
    assert(maxClean < alarmThreshold,
      f"false alarm on an undrifted source: $maxClean%.5f")

    // (c) stream == batch over the union, both monitor routes
    val all = spark.read
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true").parquet(inDir)
    def m(df: DataFrame) = df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val finalStream = trajectory.maxBy(_._1)._2
    val batchLit = m(DriftStreams.driftMonitor(all, ref, "source", "text"))
    val batchJoin = m(
      DriftStreams.driftMonitorJoined(all, ref, "source", "text"))
    assert(batchLit == batchJoin,
      s"joined route diverged at 5M docs: $batchJoin vs $batchLit")
    val diffs = batchLit.collect { case (g, v)
      if finalStream.get(g) != Some(v._3) => g -> (finalStream.get(g), v._3) }
    assert(diffs.isEmpty, s"stream final state != batch: $diffs")
    println("[driftprobe] PASS: alarm on batch 7, zero false alarms, " +
      "stream == batch == joined route at 5M docs (parity diff 0)")
    spark.stop()
  }
}
