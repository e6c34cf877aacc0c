package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.deltalog.{DeltaFixtureWriter, DeltaLog}
import graft.health.DeltaAnalyzerMetrics
import graft.operators.{HealthAnalyzer, HistoryAnalyzer, Reporting, SkewAnalyzer, StorageAnalyzer}
import graft.sources.Sources

/** Coverage for the remaining SURVEY §2 rows: S7 CSV, A17 per-version
  * deltas, A18 trend, O4 argmax, F5-F7 formatting, plus the §5 ScalaCheck
  * skew/orphan invariants. */
class ReportingSourcesSpec extends SparkSuite {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  test("S7: CSV source with header + schema inference") {
    val dir = tmpDir("csv")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "tips.csv"),
      "total_bill,tip,day,size\n16.99,1.01,Sun,2\n10.34,1.66,Mon,3\n")
    val df = Sources.readCsv(spark, s"$dir/tips.csv")
    assert(df.count() === 2)
    assert(df.schema("total_bill").dataType.typeName === "double")
    assert(df.schema("size").dataType.typeName === "integer")
  }

  test("A17: per-version file deltas from operationMetrics") {
    val path = tmpDir("hist")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 20), Seq("Dinner" -> 20))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day"))
    DeltaFixtureWriter.write(df.limit(5), path, "append", Seq("day"))
    DeltaFixtureWriter.compact(spark, path)
    val snap = DeltaLog.snapshot(spark, path)
    val deltas = HistoryAnalyzer.perVersionFileDeltas(snap.history).collect()
    assert(deltas.length === 3)
    assert(deltas.map(_.getAs[Long]("version")).toSeq === Seq(0L, 1L, 2L))
    assert(deltas(0).getAs[Long]("num_files_added") > 0)
    assert(deltas(2).getAs[Long]("num_files_removed") > 0, "compact removes files")
    val enriched = HistoryAnalyzer.enriched(snap.history).collect()
    assert(enriched.length === 3)
    assert(enriched.forall(_.getAs[java.sql.Timestamp]("timestamp") != null))
    snap.unpersist()
  }

  test("A18: trend frame unions per-run metrics ordered by date") {
    val runs = Seq(
      (java.sql.Timestamp.valueOf("2026-01-02 00:00:00"),
        DeltaAnalyzerMetrics(recordCount = 200, numberOfWrites = 2)),
      (java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
        DeltaAnalyzerMetrics(recordCount = 100, numberOfWrites = 1)))
    val t = Reporting.trend(runs, spark).collect()
    assert(t.length === 2)
    assert(t(0).getAs[Long]("record_count") === 100L, "sorted by date")
    assert(t(1).getAs[Long]("writes") === 2L)
  }

  test("O4: argmax partition deterministic under ties") {
    val counts = Seq(("a", 5L), ("b", 9L), ("c", 9L)).toDF("k", "count")
    val top = Reporting.argmaxPartition(counts, "k", "count").collect()
    assert(top.length === 1)
    assert(top(0).getString(0) === "b")
  }

  test("F5-F7: display formatting scalars") {
    val df = Seq(("num_added_files", "x" * 60, 5L * 1024 * 1024, 2500L))
      .toDF("key", "longtext", "bytes", "ms")
      .select(
        Reporting.titleLabel(col("key")).as("label"),
        Reporting.truncated(col("longtext")).as("trunc"),
        Reporting.humanBytes(col("bytes")).as("size"),
        Reporting.humanMillis(col("ms")).as("dur"))
    val r = df.first()
    assert(r.getString(0) === "Num Added Files")
    assert(r.getString(1).endsWith("...") && r.getString(1).length === 50)
    assert(r.getString(2) === "5.00 MB")
    assert(r.getString(3) === "2.5 s")
  }

  test("H6'/spark heuristics variant: write-heavy table flags vacuum") {
    val m = DeltaAnalyzerMetrics(numberOfWrites = 50, numberOfOptimizes = 1,
      dataFileCount = 40, avgFileSizeBytes = 512 * 1024)
    val h = HealthAnalyzer.sparkHeuristics(m)
    assert(h.needsVacuum)                     // 50 > 10*1
    assert(h.hasOrphanFiles)                  // alias of needsVacuum
    assert(h.filesNeedingVacuum === 4L)       // 10% of files
    assert(h.storageEfficiency === Some(0.95))
    assert(h.smallFilesCount === 32L)         // avg < 1MB → 0.8 * files
  }

  test("property: skewness_max in [0,1], 0 for single partition, permutation-invariant") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 10000L))
    check(Prop.forAll(gen) { counts =>
      val df = counts.zipWithIndex.map { case (c, i) => (i.toString, c) }
        .toDF("k", "count")
      val row = SkewAnalyzer.skewnessStats(df).first()
      val mx = row.getAs[Double]("skewness_max")
      val avg = row.getAs[Double]("skewness_average")
      val inRange = mx >= 0.0 && mx <= 1.0 && avg >= 0.0
      val singleOk = counts.size > 1 || (mx == 0.0 && avg == 0.0)
      // permutation invariance
      val shuffled = scala.util.Random.shuffle(counts)
      val df2 = shuffled.zipWithIndex.map { case (c, i) => (i.toString, c) }
        .toDF("k", "count")
      val row2 = SkewAnalyzer.skewnessStats(df2).first()
      inRange && singleOk &&
        math.abs(mx - row2.getAs[Double]("skewness_max")) < 1e-12 &&
        math.abs(avg - row2.getAs[Double]("skewness_average")) < 1e-12
    })
  }

  test("E3: dashboard frames bundle all five visualization inputs") {
    val path = tmpDir("dash")
    TestFixtures.buildSkewedTable(spark, path)
    val f = graft.operators.Dashboard.frames(spark, path)
    assert(f.metrics.healthScore.isDefined)
    assert(f.recommendations.count() > 0)
    val top = f.partitionCountsTopN.collect()
    assert(top.nonEmpty && top.length <= 16)
    assert(top.head.getAs[Long]("count") >= top.last.getAs[Long]("count") ||
      top.last.getString(0) == "Others")
    assert(f.fileSizeBins.count() > 0)
    val hist = f.historyEnriched.collect()
    assert(hist.length === f.metrics.versionCount + 1)
    assert(f.perVersionFileDeltas.count() === hist.length)
  }

  test("distributed folder listing == driver-side listing") {
    val path = tmpDir("dlist")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 30, "Tue" -> 30),
      Seq("Dinner" -> 30, "Lunch" -> 30))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    DeltaFixtureWriter.write(df.limit(10), path, "append", Seq("day", "time"))
    def normalize(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0).stripPrefix("file:"), r.getLong(1)))
        .toSet
    val driver = normalize(StorageAnalyzer.folderFiles(spark, path))
    val dist = normalize(StorageAnalyzer.folderFilesDistributed(spark, path, 4))
    assert(driver.nonEmpty)
    assert(dist === driver)
  }

  test("property: orphan count = folder - manifest when manifest ⊆ folder") {
    val gen = for {
      total <- Gen.chooseNum(1, 30)
      active <- Gen.chooseNum(0, total)
    } yield (total, active)
    check(Prop.forAll(gen) { case (total, active) =>
      val folder = (0 until total).map(i => (s"/t/f$i.parquet", 100L))
        .toDF("path", "size")
      val manifest = (0 until active).map(i => (s"/t/f$i.parquet", 100L))
        .toDF("path", "size")
      StorageAnalyzer.orphanFiles(folder, manifest).count() == (total - active).toLong
    })
  }
}
