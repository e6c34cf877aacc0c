package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.deltalog.DeltaLog
import graft.health.{DeltaAnalyzerMetrics, Thresholds}

/** E3 parity (SURVEY.md §3): the visualization pipeline's five tidy input
  * frames in one call — the engine delivers the DATA the reference's plotly
  * notebooks render (health_dashboard / skew_analysis / file_distribution /
  * delta_operations); rendering stays out of engine scope. */
object Dashboard {

  final case class Frames(
      metrics: DeltaAnalyzerMetrics,
      recommendations: DataFrame,       // H12
      partitionCountsTopN: DataFrame,   // skew bar: top-15 + Others
      fileSizeBins: DataFrame,          // 20-bin size histogram
      historyEnriched: DataFrame,       // ops timeline w/ filtered params
      perVersionFileDeltas: DataFrame)  // A17 bars

  def frames(spark: SparkSession, tablePath: String,
             thresholds: Thresholds = Thresholds()): Frames = {
    // ONE snapshot (one log replay) feeds both the analysis and the frames;
    // partition counts reuse the map analyzeSnapshot already collected
    // instead of re-scanning the table
    val snap = DeltaLog.snapshot(spark, tablePath)
    // dashboard frames are display-sized (top-15, 20 bins, one row per
    // commit) — materialize them eagerly so the snapshot cache can be
    // released here rather than leaking into the caller's session
    def eager(df: DataFrame): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    try {
      val m = HealthAnalyzer.analyzeSnapshot(snap, thresholds)
      import spark.implicits._
      val counts = m.skewMetrics match {
        case Some(sk) if sk.partitionCount > sk.recordsPerPartition.size =>
          // the driver dict was capped to the top-N heaviest partitions —
          // rebuild the FULL counts frame distributively so the "Others"
          // bucket sums the whole tail, not just ranks topN-and-under
          SkewAnalyzer.recordsPerPartition(snap.data, sk.partitionColumns)
        case Some(sk) =>
          sk.recordsPerPartition.toSeq.toDF("partition", "count")
        case None => Seq.empty[(String, Long)].toDF("partition", "count")
      }
      Frames(
        metrics = m,
        recommendations = HealthAnalyzer.recommendations(spark, m),
        partitionCountsTopN =
          eager(RollupOps.topNWithOthers(counts, "partition", "count", 15)),
        fileSizeBins = eager(StorageAnalyzer.sizeHistogram(snap.activeFiles)),
        historyEnriched = eager(HistoryAnalyzer.enriched(snap.history)),
        perVersionFileDeltas =
          eager(HistoryAnalyzer.perVersionFileDeltas(snap.history)))
    } finally snap.unpersist()
  }
}
