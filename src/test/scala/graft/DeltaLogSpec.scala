package graft

import org.apache.spark.sql.functions._

import graft.deltalog.{DeltaFixtureWriter, DeltaLog}

/** Log-layer unit tests: commit writing, replay, history, snapshot data. */
class DeltaLogSpec extends SparkSuite {
  import spark.implicits._

  test("overwrite + append replay yields active files and full history") {
    val path = tmpDir("dlog")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 10, "Tue" -> 10),
      Seq("Dinner" -> 10, "Lunch" -> 10))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    DeltaFixtureWriter.write(df.limit(5), path, "append", Seq("day", "time"))

    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.version === 1L)
    assert(snap.partitionColumns === Seq("day", "time"))
    val hist = snap.history.orderBy("version").collect()
    assert(hist.length === 2)
    assert(hist.forall(_.getAs[String]("operation") == "WRITE"))
    // all files active (no removes yet)
    val nFiles = snap.activeFiles.count()
    assert(nFiles > 0)
    assert(snap.data.count() === 25)
    snap.unpersist()
  }

  test("logical overwrite removes prior files from the snapshot, not disk") {
    val path = tmpDir("dlog")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 20), Seq("Dinner" -> 20))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    val snap0 = DeltaLog.snapshot(spark, path)
    val gen0 = snap0.activeFiles.select("path").as[String].collect().toSet
    snap0.unpersist()

    DeltaFixtureWriter.write(df.limit(7), path, "overwrite", Seq("day", "time"))
    val snap = DeltaLog.snapshot(spark, path)
    val gen1 = snap.activeFiles.select("path").as[String].collect().toSet
    assert(gen0.intersect(gen1).isEmpty, "old generation must be logically removed")
    assert(snap.data.count() === 7)
    // old files still on disk → orphan-detectable
    val onDisk = graft.operators.StorageAnalyzer.folderFiles(spark, path).count()
    assert(onDisk > gen1.size)
    snap.unpersist()
  }

  test("delete rewrites only matching files; data matches predicate filter") {
    val path = tmpDir("dlog")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 30, "Tue" -> 30),
      Seq("Dinner" -> 30, "Lunch" -> 30))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    val expected = df.where("total_bill <= 40").count()
    DeltaFixtureWriter.delete(spark, path, "total_bill > 40")
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.data.count() === expected)
    assert(snap.history.where($"operation" === "DELETE").count() === 1)
    val params = snap.history.where($"operation" === "DELETE")
      .select(element_at($"operationParameters", "predicate")).as[String].first()
    assert(params === "total_bill > 40")
    snap.unpersist()
  }

  test("compact bin-packs to one active file per partition, count unchanged") {
    val path = tmpDir("dlog")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 40, "Tue" -> 20),
      Seq("Dinner" -> 40, "Lunch" -> 20))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    (1 to 3).foreach { _ =>
      DeltaFixtureWriter.write(df.limit(5), path, "append", Seq("day", "time"))
    }
    val before = DeltaLog.snapshot(spark, path)
    val nBefore = before.data.count()
    before.unpersist()
    DeltaFixtureWriter.compact(spark, path)
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.data.count() === nBefore)
    val perPartition = snap.activeFiles
      .groupBy(element_at($"partitionValues", "day"), element_at($"partitionValues", "time"))
      .count().select(max("count")).as[Long].first()
    assert(perPartition === 1L, "compaction should leave one file per partition")
    assert(snap.history.where($"operation" === "OPTIMIZE").count() === 1)
    snap.unpersist()
  }

  test("detail frame aggregates size and file count") {
    val path = tmpDir("dlog")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 10), Seq("Dinner" -> 10))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    val snap = DeltaLog.snapshot(spark, path)
    val d = snap.detail.first()
    assert(d.getAs[Long]("numFiles") === snap.activeFiles.count())
    assert(d.getAs[Long]("sizeInBytes") > 0)
    snap.unpersist()
  }

  test("metaData.schemaString is the schema authority for the data scan") {
    val path = tmpDir("dlog")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 5), Seq("Dinner" -> 5))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    val snap = DeltaLog.snapshot(spark, path)
    val full = snap.tableSchema.getOrElse(fail("schemaString not persisted/parsed"))
    assert(full.fieldNames.toSet === df.columns.toSet,
      "schemaString carries the FULL schema incl. partition columns")
    assert(snap.data.columns.toSet === df.columns.toSet)
    snap.unpersist()
  }

  test("schema-evolving append: new column visible, old files read as null") {
    val path = tmpDir("dlog")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 4), Seq("Dinner" -> 4))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    // append WITH an extra column — a new metaData action must make it the
    // live schema even though the old physical files lack the column
    val evolved = TestFixtures.tips(spark, Seq("Tue" -> 3), Seq("Lunch" -> 3))
      .withColumn("source", lit("v2"))
    DeltaFixtureWriter.write(evolved, path, "append", Seq("day", "time"))
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.tableSchema.exists(_.fieldNames.contains("source")),
      "evolved schemaString is the latest metaData")
    val data = snap.data
    assert(data.columns.contains("source"))
    assert(data.count() === 7)
    assert(data.where(col("source").isNull).count() === 4,
      "pre-evolution rows surface the added column as null")
    assert(data.where(col("source") === "v2").count() === 3)
    snap.unpersist()
  }

  test("legacy stub schemaString falls back to deterministic footer pick") {
    val path = tmpDir("dlog")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 6), Seq("Dinner" -> 6))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    // simulate a legacy log: rewrite commit 0's metaData schemaString to the
    // old stub "{}" so tableSchema cannot parse
    val lp = java.nio.file.Paths.get(path, "_delta_log", f"${0L}%020d.json")
    val rewritten = new String(java.nio.file.Files.readAllBytes(lp),
      java.nio.charset.StandardCharsets.UTF_8)
      .replaceAll("\"schemaString\":\"\\{.*?\\}\"", "\"schemaString\":\"{}\"")
    java.nio.file.Files.write(lp, rewritten.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.tableSchema.isEmpty, "stub schema must not parse")
    assert(snap.data.count() === 6, "footer-pick fallback still reads the table")
    snap.unpersist()
  }
}
