package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.streaming.{EventStreams, SketchStreams}

/** Streaming sketch monitor: the KMV/MG/KLL trio driven through
  * Structured Streaming must equal the batch aggregation over the same
  * rows — the mergeable-summaries property across micro-batch state
  * merges, not just shuffle merges. */
class SketchStreamsSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("stream (3 micro-batches) == batch on the corpus monitor") {
    val dir = tmpDir("sketch_stream")
    // 3 files with overlapping vocabulary, a clear heavy term, an empty
    // doc, and spread doc lengths; distinct tokens < kKmv and rows < kKll
    // so BOTH exact regimes must replay exactly through state merges
    val parts = Seq(
      Seq((1L, "alpha beta gamma alpha"), (2L, "alpha delta"),
        (3L, "")),
      Seq((10L, "alpha epsilon zeta eta theta iota"), (11L, "alpha beta")),
      Seq((20L, "kappa alpha"), (21L, "lambda mu nu xi omicron pi rho"),
        (22L, "alpha alpha alpha")))
    parts.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val batch = SketchStreams.corpusMonitor(
      spark.read.parquet(dir), "text").collect().head
    val stream = EventStreams.runToMemory(spark,
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(dir),
      df => SketchStreams.corpusMonitor(df, "text"),
      "sketch_monitor_stream").collect().head
    assert(stream.toSeq === batch.toSeq)
    // and the values themselves are right: 17 distinct tokens (exact KMV
    // regime), 'alpha' the top heavy hitter with count 9, discrete
    // quantiles over doc lengths (4,2,0,6,2,2,7,3) = (2,2,4) (exact KLL)
    assert(batch.getAs[Double]("distinct_tokens") === 17.0)
    val hh = batch.getSeq[org.apache.spark.sql.Row](1)
    assert(hh.head.getString(0) === "alpha" && hh.head.getLong(1) === 9L)
    assert(batch.getSeq[Double](2) === Seq(2.0, 2.0, 4.0))
    // the CM grid (r11): equals the relational cmSketch frame densified,
    // and answers the 'alpha' point query with >= its true count 9
    // (== 9 unless another corpus term collides in all 4 rows)
    val grid = batch.getSeq[Long](3)
    assert(grid.length === 4 * 1024)
    assert(grid.sum === 4L * 26L, "4 hash rows x 26 token occurrences")
    val relational = graft.operators.CorpusOps.cmSketch(
        spark.read.parquet(dir), "text", depth = 4, width = 1024)
      .collect().map(r => (r.getInt(0) * 1024 + r.getLong(1).toInt,
        r.getLong(2))).toMap
    grid.zipWithIndex.foreach { case (c, i) =>
      assert(c === relational.getOrElse(i, 0L),
        s"aggregate grid cell $i diverges from the relational form") }
    val est = spark.range(1).select(graft.functions.exprs.cmQuery(
        typedLit(grid), lit("alpha"), 4, 1024, 42L).as("e"))
      .collect().head.getLong(0)
    assert(est >= 9L && est <= 26L, s"cmQuery('alpha') = $est")
  }

  test("batch-slicing invariance: 1-file stream == 3-file stream") {
    val dirA = tmpDir("sketch_all")
    val rows = (1L to 40L).map(i =>
      (i, (0 until (i % 7).toInt).map(j => s"w${(i + j) % 11}").mkString(" ")))
    rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(dirA)
    val dirB = tmpDir("sketch_split")
    rows.grouped(14).foreach(g => g.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dirB))
    def run(dir: String, name: String) = EventStreams.runToMemory(spark,
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(dir),
      df => SketchStreams.corpusMonitor(df, "text"), name).collect().head
    assert(run(dirA, "sk_one").toSeq === run(dirB, "sk_three").toSeq)
  }
}
