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
}
