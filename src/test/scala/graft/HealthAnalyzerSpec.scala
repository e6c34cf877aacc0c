package graft

import graft.health.Thresholds
import graft.operators.HealthAnalyzer

/** 1:1 port of the reference's pytest suite
  * (test/test_delta_analyzer_metrics.py, test/test_delta_analyzer_load.py) —
  * same data distributions, same threshold assertions. */
class HealthAnalyzerSpec extends SparkSuite {

  test("skewed table: skewness and op-count bounds (test_delta_analyzer_metrics.py:33-41)") {
    val path = tmpDir("skewed")
    TestFixtures.buildSkewedTable(spark, path)
    val m = HealthAnalyzer.analyzeTable(spark, path)
    assert(m.numberOfWrites >= 4)
    assert(m.numberOfDeletes >= 1)
    assert(m.skewnessMax > 0.7, s"skewness_max=${m.skewnessMax}")
    assert(m.skewnessAverage > 0.2, s"skewness_average=${m.skewnessAverage}")
    assert(m.isSkewed)
  }

  test("balanced table: skewness < 0.01 (test_delta_analyzer_metrics.py:43-61)") {
    val path = tmpDir("balanced")
    TestFixtures.buildBalancedTable(spark, path)
    val m = HealthAnalyzer.analyzeTable(spark, path)
    assert(m.skewnessMax < 0.01, s"skewness_max=${m.skewnessMax}")
    assert(m.skewnessAverage < 0.01, s"skewness_average=${m.skewnessAverage}")
  }

  test("fresh table has no orphans at threshold 0.5 (test_delta_analyzer_metrics.py:63-82)") {
    val path = tmpDir("noorphan")
    TestFixtures.buildBalancedTable(spark, path)
    val m = HealthAnalyzer.analyzeTable(spark, path,
      Thresholds(orphanFileRatioThreshold = 0.5))
    assert(!m.hasOrphanFiles, s"ratio=${m.dataFileCount}/${m.totalFileCount}")
    assert(m.orphanFilesCount === 0)
  }

  test("churned table has orphans at threshold 0.8 (test_delta_analyzer_metrics.py:84-108)") {
    val path = tmpDir("orphan")
    TestFixtures.buildOrphanTable(spark, path)
    val m = HealthAnalyzer.analyzeTable(spark, path,
      Thresholds(orphanFileRatioThreshold = 0.8))
    assert(m.hasOrphanFiles,
      s"data=${m.dataFileCount} total=${m.totalFileCount} orphans=${m.orphanFilesCount}")
    assert(m.orphanFilesCount > 0)
    assert(m.needsVacuum, "churn should leave dead bytes > 30% of folder")
  }

  test("skew metrics bundle: keys, partition columns, argmax partition (test_delta_analyzer_metrics.py:110-150)") {
    val path = tmpDir("skewdict")
    val df = TestFixtures.tips(spark,
      Seq("Mon" -> 80, "Tue" -> 10, "Wed" -> 10),
      Seq("Dinner" -> 80, "Lunch" -> 20))
    graft.deltalog.DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    val m = HealthAnalyzer.analyzeTable(spark, path)
    val sk = m.skewMetrics.get
    assert(sk.partitionColumns === Seq("day", "time"))
    assert(m.skewnessMax === sk.skewnessMax)
    assert(m.partitionSkewness === Some(sk.skewnessMax))
    assert(sk.recordsPerPartition.nonEmpty)
    val (maxKey, maxCount) = sk.recordsPerPartition.maxBy(_._2)
    assert(maxKey === "Mon/Dinner")
    assert(maxCount >= 70)
    assert(sk.maxPartition === Some(maxKey -> maxCount))
    assert(sk.partitionCount === sk.recordsPerPartition.size.toLong,
      "cap not hit here: dict covers all partitions")
  }

  test("skew analyze: high-cardinality partition column is capped on the driver") {
    import org.apache.spark.sql.functions.{col, format_string, lit}
    // 5000 distinct keys, one hot key — the dict must stay bounded while
    // cardinality and exact extremes stay true
    val df = spark.range(5000).select(format_string("k%04d", col("id")).as("k"))
      .union(spark.range(99).select(lit("k0007").as("k")))
    val sk = graft.operators.SkewAnalyzer.analyze(df.toDF(), Seq("k"),
      threshold = 0.1, topN = 100)
    assert(sk.partitionCount === 5000L)
    assert(sk.recordsPerPartition.size === 100)
    assert(sk.maxPartition === Some("k0007" -> 100L))
    assert(sk.minPartition.get._2 === 1L)
    // the top-N map is by weight: the hot key is in it
    assert(sk.recordsPerPartition("k0007") === 100L)
    assert(sk.isSkewed)
  }

  test("S1 catalog dispatch: analyze by registered table name == by path") {
    val path = tmpDir("catalogtbl")
    val df = TestFixtures.tips(spark,
      Seq("Mon" -> 40, "Tue" -> 20), Seq("Dinner" -> 40, "Lunch" -> 20))
    graft.deltalog.DeltaFixtureWriter.write(df, path, "overwrite", Seq("day"))
    val name = "graft_s1_catalog_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // external path-backed registration — only the catalog LOCATION is
    // consulted; the analyzer reads the delta log underneath, not the
    // parquet-source table
    spark.catalog.createTable(name, path)
    try {
      assert(graft.operators.HealthAnalyzer.resolveTarget(spark, path) === path)
      val byName = graft.operators.HealthAnalyzer.analyzeTarget(spark, name)
      val byPath = graft.operators.HealthAnalyzer.analyzeTable(spark, path)
      // identical metrics; only the recorded tablePath spelling (catalog
      // locations come back scheme-qualified) may differ
      assert(byName.copy(tablePath = "") === byPath.copy(tablePath = ""))
      assert(graft.deltalog.DeltaLog.stripSchemeStr(byName.tablePath) === path)
      // facade sniff: same result through DeltaAnalyzer.analyze
      val viaFacade = graft.DeltaAnalyzer.analyze(spark, name)
      assert(viaFacade.copy(tablePath = "") === byPath.copy(tablePath = ""))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      ()
    }
  }

  test("smoke: complex table loads and reports version_count > 0 (test_delta_analyzer_load.py:6-11)") {
    val path = tmpDir("complex")
    TestFixtures.buildSkewedTable(spark, path)
    val m = HealthAnalyzer.analyzeTable(spark, path)
    assert(m.versionCount > 0)
    assert(m.tablePath === path)
    assert(m.recordCount > 0)
    assert(m.healthScore.isDefined)
    assert(m.healthStatus.isDefined)
  }
}
