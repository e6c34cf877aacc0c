package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.queries.Queries
import graft.streaming.EventStreams

/** Multimodal plumbing + streaming/batch parity specs. */
class MultimodalStreamingSpec extends SparkSuite {
  import spark.implicits._

  test("multimodal: batched decode preserves ids, emits fixed-dim features") {
    val media = Multimodal.syntheticMedia(spark, 200)
    val feats = Multimodal.decodeFeatures(media, batchSize = 16, partitions = Some(4))
    val rows = feats.collect()
    assert(rows.length === 200)
    assert(rows.forall(_.feature.length === Multimodal.FeatureDim))
    assert(rows.map(_.media_id).sorted.toSeq === (0L until 200L))
    // deterministic: same input → same features
    val again = Multimodal.decodeFeatures(media, batchSize = 64).collect()
    val a = rows.sortBy(_.media_id).map(_.feature.toSeq)
    val b = again.sortBy(_.media_id).map(_.feature.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("multimodal: real PNG payload decodes to pixel statistics via ImageIO") {
    // 32x16, left half pure black, right half pure white
    val img = new java.awt.image.BufferedImage(32, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png, Map.empty),
      // non-image payload keeps the declared stub path
      Multimodal.MediaRecord(2L, "audio", Array[Byte](1, 2, 3), Map.empty))
      .toDS()
    val feats = Multimodal.decodeFeatures(media, batchSize = 2).collect()
      .map(f => f.media_id -> f).toMap
    val f = feats(1L).feature
    assert(f(0) === 32.0f && f(1) === 16.0f && f(2) === 2.0f, "dims + aspect")
    assert(f(3) === 0.5f && f(4) === 0.5f && f(5) === 0.5f, "mean RGB = 0.5")
    assert(math.abs(f(6) - 0.5f) < 1e-6, "mean luma")
    assert(math.abs(f(7) - 0.5f) < 1e-6, "luma stddev of a half/half image")
    assert(f(8) === 0.5f && f(15) === 0.5f, "luma histogram: extremes only")
    assert((9 to 14).forall(i => f(i) === 0.0f))
    assert(feats(1L).n_bytes === png.length.toLong)
    // corrupt image payload falls back to the stub instead of failing
    val broken = Seq(Multimodal.MediaRecord(3L, "image",
      Array[Byte](9, 9, 9, 9), Map.empty)).toDS()
    assert(Multimodal.decodeFeatures(broken).collect().length === 1)
  }

  test("multimodal: resize rewrites image meta only; frame plan explodes video") {
    val media = Multimodal.syntheticMedia(spark, 60)
    val resized = Multimodal.resizeMeta(media, maxSide = 32).collect()
    resized.filter(_.kind == "image").foreach { r =>
      assert(r.meta("width").toInt <= 32 && r.meta("height").toInt <= 32)
    }
    resized.filter(_.kind != "image").foreach(r => assert(!r.meta.contains("resized")))
    val frames = Multimodal.frameSamplePlan(media, everyMs = 1000)
    assert(frames.count() > 0)
    val perVideo = frames.groupBy("media_id").count()
    assert(perVideo.agg(min("count")).as[Long].first() >= 2L)
  }

  test("streaming: dedupStream keeps first arrival, drops in-watermark duplicates") {
    import org.apache.spark.sql.types._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = tmpDir("stream_dedup")
    val schema = StructType(Seq(
      StructField("doc_key", StringType), StructField("ts", TimestampType),
      StructField("payload", StringType)))
    Seq(("A", ts("2024-01-01 10:00:00"), "first-a"), ("B", ts("2024-01-01 10:01:00"), "first-b"))
      .toDF("doc_key", "ts", "payload").coalesce(1).write.parquet(s"$dir/b1")
    Thread.sleep(1100)
    // A re-arrives in a later micro-batch within the watermark → dropped
    Seq(("A", ts("2024-01-01 10:02:00"), "dup-a"), ("C", ts("2024-01-01 10:03:00"), "first-c"))
      .toDF("doc_key", "ts", "payload").coalesce(1).write.parquet(s"$dir/b2")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(dir)
    val got = EventStreams.runToMemoryAppend(spark, stream,
        df => EventStreams.dedupStream(df, Seq("doc_key"), "ts", "1 hour"),
        "stream_dedup")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got === Map("A" -> "first-a", "B" -> "first-b", "C" -> "first-c"))
  }

  test("streaming: windowed agg over readStream == batch result") {
    val batchDf = Queries.events(spark, sf())
    val expected = EventStreams.hourlyTypeCounts(batchDf)
      .orderBy("window_start", "event_type").collect()

    // stream the same parquet through a memory sink: the nanos-as-long flag
    // is scoped to Queries.nanosSession, so both the schema read and the
    // readStream must run on that session (the shared one never sees it).
    // streaming file source needs a DIRECTORY — glob-filter the events file
    val nanos = Queries.nanosSession(spark)
    val rawSchema = nanos.read.parquet(s"${sf()}/events.parquet").schema
    val stream = nanos.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf())
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      .withWatermark("ts", "2 hours")
    val got = EventStreams.runToMemory(nanos, stream,
        EventStreams.hourlyTypeCounts, "hourly_stream")
      .orderBy("window_start", "event_type").collect()

    assert(got.length === expected.length)
    assert(got.map(_.toSeq).toSeq === expected.map(_.toSeq).toSeq)
  }

  test("streaming: session windows produce bounded per-user sessions") {
    val sessions = EventStreams.userSessions(Queries.events(spark, sf()), "30 minutes")
    val n = sessions.count()
    assert(n > 0)
    val bad = sessions.where(col("session_end") < col("session_start")).count()
    assert(bad === 0)
  }
}
