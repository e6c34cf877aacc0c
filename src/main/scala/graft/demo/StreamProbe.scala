package graft.demo

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale probe for Structured-Streaming stateful sessionization
  * ([[graft.streaming.EventStreams.statefulSessionsIncremental]]): ~5M
  * synthetic events driven through file-source micro-batches, recording
  * per-batch throughput, state-store row counts, and watermark behavior —
  * the numbers the spec-level parity tests can't show.
  *
  * Synthetic shape: 50k users x 100 events each. Each user's events arrive
  * in 10 bursts of 10 (events 2 min apart inside a burst, bursts 2 h apart),
  * so with a 30-min gap ground truth is EXACTLY 10 sessions of 10 events per
  * user — 500k sessions total. Files are written in event-time order (20
  * files, ~250k events each) and consumed 2 files per trigger → 10
  * micro-batches, so sessions stay open across batches and close only as the
  * 1-hour watermark passes them. Two sentinel batches (one far-future event,
  * then one further event to run timeouts under the advanced watermark)
  * flush every remaining open session, making the streaming output
  * comparable 1:1 against the batch sessionizer on the same data. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.localBuilder(32, "graft-streamprobe")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nUsers = 50000L
    val perUser = 100L
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    // event j of user u: burst = j/10 (2h apart), pos = j%10 (2min apart)
    def burst(k: Long) = spark.range(nUsers * 10L).select(
      (col("id") % nUsers).as("user_id"),
      timestamp_millis(lit(k * 7200000L + base)
        + (col("id") / nUsers).cast("long") * 120000L).as("ts"),
      (col("id") % 7 + 1).cast("double").as("value"))

    // one parquet dir per burst, written SEQUENTIALLY with explicit
    // strictly-increasing mtimes — the file source orders by modification
    // time, and a single parallel write would leave the arrival order (and
    // hence watermark progression) nondeterministic
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_probe")
    def stamp(sub: String, order: Int): Unit = {
      val d = new java.io.File(s"$dir/$sub")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(f => f.setLastModified(1000000000000L + order * 60000L))
    }
    val t0 = System.nanoTime()
    (0L until 10L).foreach { k =>
      burst(k).coalesce(1).write.mode("overwrite").parquet(s"$dir/b$k")
      stamp(s"b$k", k.toInt)
    }
    // sentinel events that advance the watermark far past every session end
    // (batch A), then trigger the timeout sweep under it (batch B)
    val far = base + 10L * 7200000L + 86400000L
    Seq((nUsers, new java.sql.Timestamp(far), 0.0))
      .toDF("user_id", "ts", "value").write.parquet(s"$dir/b98")
    stamp("b98", 98)
    Seq((nUsers, new java.sql.Timestamp(far + 3600000L), 0.0))
      .toDF("user_id", "ts", "value").write.parquet(s"$dir/b99")
    stamp("b99", 99)
    println(f"wrote ${nUsers * perUser} events in 10 burst files: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    val source = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2")
      .option("latestFirst", "false")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(dir.toString)
      .withWatermark("ts", "1 hour")

    val gapMs = 30L * 60L * 1000L
    val t1 = System.nanoTime()
    val q = graft.streaming.EventStreams
      .statefulSessionsIncremental(source, gapMs)
      .writeStream.outputMode("append").format("memory")
      .queryName("probe_sessions").start()
    try q.processAllAvailable() finally q.stop()
    val wall = (System.nanoTime() - t1) / 1e9

    val prog = q.recentProgress.toSeq
    val inRows = prog.map(_.numInputRows).sum
    val maxState = prog.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsTotal).max
    val maxStateBytes = prog.flatMap(_.stateOperators.toSeq)
      .map(_.memoryUsedBytes).max
    val batchSecs = prog.filter(_.numInputRows > 0)
      .map(_.durationMs.get("triggerExecution").toDouble / 1000)
    println(f"streaming sessionization: $inRows rows in ${prog.size} " +
      f"micro-batches, $wall%.1f s wall (${inRows / wall}%.0f events/s)")
    println(f"  state store: max $maxState open-session state rows " +
      f"(${maxStateBytes / 1024 / 1024} MiB); slowest batch " +
      f"${batchSecs.max}%.1f s, median " +
      f"${batchSecs.sorted.apply(batchSecs.size / 2)}%.1f s")

    val got = spark.table("probe_sessions").where(col("user_id") < nUsers)
    val nSessions = got.count()
    val badShape = got.where(col("n_events") =!= 10L).count()
    println(s"  sessions emitted: $nSessions (ground truth ${nUsers * 10}); " +
      s"$badShape off the 10-event shape (want 0)")
    require(nSessions == nUsers * 10 && badShape == 0L,
      "streaming sessionization diverged from the synthetic ground truth")
    // batch parity on the same files (sentinels excluded)
    val batch = graft.streaming.EventStreams.statefulSessions(
      spark.read.schema(schema).parquet(dir.toString + "/part=*")
        .where(col("user_id") < nUsers), gapMs)
    val nBatch = batch.count()
    println(s"  batch sessionizer on the same data: $nBatch sessions")
    require(nBatch == nSessions, s"batch $nBatch != streaming $nSessions")
    spark.stop()
  }
}
