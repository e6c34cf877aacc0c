package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in batched per-partition
  * passes.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, typed
  * Encoders) is real and tested; the actual media DECODE step is a clearly
  * marked STUB (this container ships no image/audio codecs) — a deterministic
  * fake that derives features from the payload bytes. Swapping in a real
  * decoder (e.g. javacv / a JNI codec) changes only [[stubDecode]]'s body:
  * same batch iteration, same output schema.
  */
object Multimodal {

  /** One media object: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,                  // image | audio | video
      content: Array[Byte],
      meta: Map[String, String])     // width/height/sample_rate/duration_ms...

  /** Extracted features: fixed-dim embedding + basic stats. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      feature: Array[Float])

  val FeatureDim = 16

  /** Deterministic synthetic media corpus (payload bytes derived from id) —
    * the fixture generator for the plumbing tests. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { r =>
      val id = r
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 64 + (id % 192).toInt
      val bytes = Array.tabulate[Byte](len)(i => ((id * 31 + i * 7) % 251).toByte)
      val meta = kind match {
        case "image" => Map("width" -> s"${64 + id % 64}", "height" -> s"${64 + id % 48}")
        case "audio" => Map("sample_rate" -> "16000", "duration_ms" -> s"${100 + id % 900}")
        case _ => Map("fps" -> "30", "duration_ms" -> s"${1000 + id % 9000}")
      }
      MediaRecord(id, kind, bytes, meta)
    }
  }

  /** STUB decode ??? — stands in for the real codec call. Deterministic:
    * features are rolling-hash projections of the payload, so tests can
    * assert exact values. A real implementation would decode pixels/samples
    * here and compute the same-shaped output. */
  private[multimodal] def stubDecode(r: MediaRecord): MediaFeatures = {
    val f = new Array[Float](FeatureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < r.content.length) {
      h = 31L * h + r.content(i)
      f(i % FeatureDim) += ((h % 1000L) / 1000.0f)
      i += 1
    }
    MediaFeatures(r.media_id, r.kind, r.content.length.toLong, f)
  }

  /** Batched per-partition decode/feature-extract: the Scala analogue of a
    * `mapInPandas` batch UDF — payloads are processed `batchSize` at a time
    * per partition (a real decoder would amortize codec init per batch).
    * The input is first hash-repartitioned so payload bytes distribute
    * evenly regardless of upstream layout. */
  def decodeFeatures(media: Dataset[MediaRecord], batchSize: Int = 64,
                     partitions: Option[Int] = None): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val repartitioned = partitions.map(media.repartition(_)).getOrElse(media)
    repartitioned.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder/codec setup would go here
        batch.iterator.map(stubDecode)
      }
    }
  }

  /** Metadata-level resize: rewrites width/height for image rows, payload
    * untouched (a real pipeline would re-encode; the plumbing — filtering by
    * kind, map rewrite — is what this exercises). */
  def resizeMeta(media: Dataset[MediaRecord], maxSide: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.kind != "image") r
      else {
        val w = r.meta.getOrElse("width", "0").toInt
        val h = r.meta.getOrElse("height", "0").toInt
        val scale = if (math.max(w, h) <= maxSide) 1.0
                    else maxSide.toDouble / math.max(w, h)
        r.copy(meta = r.meta ++ Map(
          "width" -> math.round(w * scale).toString,
          "height" -> math.round(h * scale).toString,
          "resized" -> (scale != 1.0).toString))
      }
    }
  }

  /** Frame sampling plan for video rows: every `everyMs` within duration →
    * one output row per sampled frame offset (explode-shaped). */
  def frameSamplePlan(media: Dataset[MediaRecord], everyMs: Int = 1000): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .map(r => (r.media_id, r.meta.getOrElse("duration_ms", "0").toLong))
      .toDF("media_id", "duration_ms")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs.toLong)))
          .as("frame_offset_ms"))
  }
}
