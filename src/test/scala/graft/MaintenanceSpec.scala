package graft

import org.apache.spark.sql.functions._

import graft.deltalog.{DeltaFixtureWriter, DeltaLog}
import graft.health.Thresholds
import graft.operators.{HealthAnalyzer, Maintenance}

/** Checkpoint, time travel, and the executable maintenance ops. */
class MaintenanceSpec extends SparkSuite {
  import spark.implicits._

  test("time travel: snapshotAt reconstructs earlier versions") {
    val path = tmpDir("tt")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 20, "Tue" -> 20),
      Seq("Dinner" -> 20, "Lunch" -> 20))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day"))
    DeltaFixtureWriter.write(df.limit(10), path, "append", Seq("day"))
    DeltaFixtureWriter.delete(spark, path, "total_bill > 40")
    val v0 = DeltaLog.snapshotAt(spark, path, 0)
    val v1 = DeltaLog.snapshotAt(spark, path, 1)
    val v2 = DeltaLog.snapshot(spark, path)
    assert(v0.data.count() === 40)
    assert(v1.data.count() === 50)
    assert(v2.data.count() < 50, "delete shrank latest version")
    Seq(v0, v1, v2).foreach(_.unpersist())
  }

  test("restore: file-set rollback, round trip, and history") {
    val path = tmpDir("restore")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 20, "Tue" -> 20),
      Seq("Dinner" -> 20, "Lunch" -> 20))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day"))       // v0: 40
    DeltaFixtureWriter.write(df.limit(10), path, "append", Seq("day")) // v1: 50
    DeltaFixtureWriter.delete(spark, path, "total_bill > 40")          // v2: < 50

    def rows(): Set[String] = DeltaLog.snapshot(spark, path).data
      .selectExpr("concat_ws('|', day, time, cast(total_bill as string))")
      .collect().map(_.getString(0)).toSet
    val v1Rows = {
      val s = DeltaLog.snapshotAt(spark, path, 1)
      val r = s.data
        .selectExpr("concat_ws('|', day, time, cast(total_bill as string))")
        .collect().map(_.getString(0)).toSet
      s.unpersist(); r
    }
    assert(rows() !== v1Rows, "delete must have changed the data")

    Maintenance.restore(spark, path, 1L)                               // v3
    assert(rows() === v1Rows, "restore must reproduce version 1 exactly")
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.version === 3L)
    assert(snap.history.where(col("operation") === "RESTORE").count() === 1L)
    snap.unpersist()

    // round trip further back, then forward again
    Maintenance.restore(spark, path, 0L)                               // v4
    assert(rows().size === 40)
    Maintenance.restore(spark, path, 2L)                               // v5
    val v2 = DeltaLog.snapshotAt(spark, path, 2)
    val v2Rows = v2.data
      .selectExpr("concat_ws('|', day, time, cast(total_bill as string))")
      .collect().map(_.getString(0)).toSet
    v2.unpersist()
    assert(rows() === v2Rows, "restore forward to v2 must match v2")
    // restore to current version = recorded no-op
    Maintenance.restore(spark, path, 5L)
    val s2 = DeltaLog.snapshot(spark, path)
    assert(s2.version === 6L)
    assert(rows() === v2Rows)
    s2.unpersist()
    // appends continue to work on a restored table
    DeltaFixtureWriter.write(df.limit(3), path, "append", Seq("day"))
    assert(rows().size >= v2Rows.size)
  }

  test("restore refuses when target files were vacuumed away") {
    val path = tmpDir("restore_vac")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 10), Seq("Dinner" -> 10))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq.empty)         // v0
    // v1 rewrites everything (delete-all predicate removes v0's files)
    DeltaFixtureWriter.delete(spark, path, "total_bill >= 0")          // v1
    Maintenance.vacuum(spark, path, retainMs = 0L)                     // v2
    val ex = intercept[IllegalArgumentException] {
      Maintenance.restore(spark, path, 0L)
    }
    assert(ex.getMessage.contains("no longer on disk"))
    // and the failed restore wrote NO commit
    val s = DeltaLog.snapshot(spark, path)
    assert(s.version === 2L)
    s.unpersist()
  }

  test("checkpoint: replay survives deleting pre-checkpoint JSON commits") {
    val path = tmpDir("ckpt")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 30, "Tue" -> 30),
      Seq("Dinner" -> 30, "Lunch" -> 30))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day"))
    DeltaFixtureWriter.write(df.limit(10), path, "append", Seq("day"))
    val before = DeltaLog.snapshot(spark, path)
    val expected = before.data.count()
    before.unpersist()

    val v = Maintenance.checkpoint(spark, path)
    assert(v === 1L)
    // a later commit on top of the checkpoint
    DeltaFixtureWriter.write(df.limit(5), path, "append", Seq("day"))
    // expire the pre-checkpoint JSON commits
    (0L to v).foreach { i =>
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(path, "_delta_log", f"$i%020d.json"))
    }
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.data.count() === expected + 5)
    assert(snap.partitionColumns === Seq("day"), "metaData restored from checkpoint")
    assert(snap.version === 2L)
    // classic checkpoint layout: ONE plain file (not a Spark part-file
    // directory), carrying the protocol action so external readers — and
    // replay after JSON cleanup — retain it
    val ckptFile = new java.io.File(path, f"_delta_log/$v%020d.checkpoint.parquet")
    assert(ckptFile.isFile, "checkpoint must be a single file")
    val proto = snap.actions.where(col("protocol").isNotNull)
      .select("protocol.minReaderVersion", "protocol.minWriterVersion")
      .collect()
    assert(proto.nonEmpty, "protocol action survives JSON cleanup")
    assert(proto.head.getInt(0) === 1 && proto.head.getInt(1) === 2)
    snap.unpersist()
  }

  test("restore: round-trip returns data+schema to the target version, history renders it") {
    val path = tmpDir("restore")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 20, "Tue" -> 20),
      Seq("Dinner" -> 20, "Lunch" -> 20))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day"))        // v0: 40 rows
    DeltaFixtureWriter.write(df.limit(10), path, "append", Seq("day")) // v1: 50 rows
    // schema evolution after the target version, then a delete
    DeltaFixtureWriter.write(df.limit(5).withColumn("extra", lit(1)),
      path, "append", Seq("day"))                                      // v2: 55 rows, +extra
    DeltaFixtureWriter.delete(spark, path, "total_bill > 40")          // v3
    val target = DeltaLog.snapshotAt(spark, path, 1)
    val want = target.data.orderBy("day", "time", "total_bill")
      .collect().map(_.toSeq)
    target.unpersist()

    Maintenance.restore(spark, path, 1)
    val got = DeltaLog.snapshot(spark, path)
    assert(got.version === 4L, "RESTORE is a new commit, not a rewind")
    assert(got.data.count() === 50L)
    assert(!got.data.columns.contains("extra"),
      "restored table reads with the target version's schema")
    assert(got.data.orderBy("day", "time", "total_bill")
      .collect().map(_.toSeq).toSeq === want.toSeq)

    // history + A17 file deltas render the op
    val hist = got.history
    val restoreRow = hist.where(col("operation") === "RESTORE")
      .select("version").as[Long].collect()
    assert(restoreRow.toSeq === Seq(4L))
    val deltas = graft.operators.HistoryAnalyzer.perVersionFileDeltas(hist)
      .where(col("version") === 4L).collect()
    assert(deltas.length === 1)
    got.unpersist()

    // restoring to a state whose files were vacuumed must fail fast
    Maintenance.vacuum(spark, path, retainMs = -1000)
    val e = intercept[IllegalArgumentException] {
      Maintenance.restore(spark, path, 3)
    }
    assert(e.getMessage.contains("vacuumed"))
  }

  test("vacuum deletes aged orphans, logs VACUUM, and health recovers") {
    val path = tmpDir("vac")
    TestFixtures.buildOrphanTable(spark, path)
    val sick = HealthAnalyzer.analyzeTable(spark, path,
      Thresholds(orphanFileRatioThreshold = 0.8))
    assert(sick.hasOrphanFiles && sick.needsVacuum)

    val dry = Maintenance.vacuum(spark, path, retainMs = 0L, dryRun = true)
    val nOrphans = dry.count()
    assert(nOrphans > 0)
    assert(graft.operators.StorageAnalyzer.folderFiles(spark, path).count()
      > sick.dataFileCount, "dry run deletes nothing")

    val deleted = Maintenance.vacuum(spark, path, retainMs = 0L)
    assert(deleted.count() === nOrphans)
    val healed = HealthAnalyzer.analyzeTable(spark, path,
      Thresholds(orphanFileRatioThreshold = 0.8))
    assert(!healed.hasOrphanFiles)
    assert(!healed.needsVacuum)
    assert(healed.orphanFilesCount === 0)
    assert(healed.recordCount === sick.recordCount, "data untouched")
    assert(healed.healthScore.get > sick.healthScore.get)
    val vacuumOps = DeltaLog.snapshot(spark, path).history
      .where(col("operation") === "VACUUM").count()
    assert(vacuumOps === 1L)
  }

  test("vacuum is a no-op on a healthy table addressed by file: URI") {
    // regression: manifest paths (tablePath + rel) vs folder-listing paths
    // (always fully qualified) must normalize identically — before the
    // qualification fix, a schemed or relative tablePath made EVERY active
    // file miss the anti-join and vacuum deleted live data
    val path = tmpDir("vacuri")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "day")
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day"))
    val before = DeltaLog.snapshot(spark, path)
    val nActive = before.activeFiles.count()
    before.unpersist()
    val deleted = Maintenance.vacuum(spark, s"file:$path", retainMs = 0L)
    assert(deleted.count() === 0L, "no orphans → nothing to delete")
    val after = DeltaLog.snapshot(spark, path)
    assert(after.data.count() === 3L, "active data files must survive vacuum")
    assert(after.activeFiles.count() === nActive)
    after.unpersist()
  }

  test("DELETE keeps rows whose predicate evaluates to NULL") {
    val path = tmpDir("delnull")
    val df = Seq(
      (1L, Some(50.0), "Mon"), (2L, None, "Mon"), (3L, Some(10.0), "Mon"))
      .toDF("id", "v", "day")
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day"))
    DeltaFixtureWriter.delete(spark, path, "v > 45")
    val snap = DeltaLog.snapshot(spark, path)
    val ids = snap.data.select("id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(2L, 3L), "NULL-predicate row must survive the delete")
    snap.unpersist()
  }

  test("checkpoint preserves history metrics while JSON commits remain") {
    val path = tmpDir("ckpthist")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 20), Seq("Dinner" -> 20))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day"))
    DeltaFixtureWriter.write(df.limit(5), path, "append", Seq("day"))
    DeltaFixtureWriter.write(df.limit(5), path, "append", Seq("day"))
    Maintenance.checkpoint(spark, path)
    val snap = DeltaLog.snapshot(spark, path)
    val ops = graft.operators.HistoryAnalyzer.opCounts(snap.history).first()
    assert(ops.getAs[Long]("number_of_writes") === 3L,
      "pre-checkpoint WRITE commits still count while their JSONs exist")
    // pre-checkpoint time travel still works too
    assert(DeltaLog.snapshotAt(spark, path, 0).data.count() === 20)
    snap.unpersist()
  }

  test("fully-deleted table analyzes without crashing") {
    val path = tmpDir("empty")
    val df = TestFixtures.tips(spark, Seq("Mon" -> 10), Seq("Dinner" -> 10))
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day", "time"))
    DeltaFixtureWriter.delete(spark, path, "total_bill > 0")
    val m = HealthAnalyzer.analyzeTable(spark, path)
    assert(m.recordCount === 0L)
    assert(m.dataFileCount === 0L)
    assert(m.skewnessMax === 0.0)
    assert(m.healthScore.isDefined)
    // compact on the empty table is a logged no-op
    Maintenance.optimize(spark, path)
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.history.where(col("operation") === "OPTIMIZE").count() === 1L)
    snap.unpersist()
  }

  test("merge upserts by key, inserts unmatched, logs MERGE commit") {
    val path = tmpDir("merge")
    val df = Seq(
      (1L, 10.0, "Mon"), (2L, 20.0, "Mon"), (3L, 30.0, "Tue"))
      .toDF("id", "v", "day")
    DeltaFixtureWriter.write(df, path, "overwrite", Seq("day"))
    val source = Seq((2L, 99.0, "Mon"), (4L, 40.0, "Wed")).toDF("id", "v", "day")
    DeltaFixtureWriter.merge(spark, path, source, Seq("id"))
    val snap = DeltaLog.snapshot(spark, path)
    val got = snap.data.select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0, 4L -> 40.0))
    assert(snap.history.where(col("operation") === "MERGE").count() === 1L)
    snap.unpersist()
    // A5: merge shows up in operation counts
    val snap2 = DeltaLog.snapshot(spark, path)
    val ops = graft.operators.HistoryAnalyzer.opCounts(snap2.history).first()
    assert(ops.getAs[Long]("number_of_merges") === 1L)
    snap2.unpersist()
  }

  test("ivf top-k: probes nearest cells, exact cosine within them") {
    val e = table("embeddings")
    val r = graft.operators.Similarity.ivfTopK(
      e.where(col("vec_id") < 5), e, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3).collect()
    assert(r.nonEmpty)
    assert(r.groupBy(_.getLong(0)).forall(_._2.length <= 3))
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val cosines = rows.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq
      assert(cosines === cosines.sorted.reverse)
    }
    // IVF with full probing degenerates to (at least) brute-force's top-1
    val full = graft.operators.Similarity.ivfTopK(
      e.where(col("vec_id") < 5), e, "vec_id", "embedding",
      k = 1, nlist = 4, nprobe = 4).collect()
    val brute = graft.operators.Similarity.bruteForceTopK(
      e.where(col("vec_id") < 5), e, "vec_id", "embedding", k = 1).collect()
    val fullTop = full.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bruteTop = brute.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fullTop === bruteTop, "probing every cell must match brute force")
  }

  test("filtered top-k: neighbors share the query's key; single-key corpus " +
      "degenerates to brute force") {
    val e = table("embeddings")
    // every returned neighbor must carry the query's label
    val labelOf = e.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val r = graft.operators.Similarity.filteredTopK(
      e.where(col("vec_id") < 10), e, "vec_id", "embedding", "label", k = 5)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(labelOf(row.getLong(1)) === labelOf(row.getLong(0)),
        s"neighbor ${row.getLong(1)} crossed the label filter")
    }
    // a constant key filters nothing: must equal brute force exactly
    val one = e.withColumn("label", lit(1))
    val filt = graft.operators.Similarity.filteredTopK(
      one.where(col("vec_id") < 5), one, "vec_id", "embedding", "label", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val brute = graft.operators.Similarity.bruteForceTopK(
      e.where(col("vec_id") < 5), e, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(filt === brute)
    // a key no corpus row shares yields no rows for that query
    val lonely = e.where(col("vec_id") < 3).withColumn("label", lit(-99))
    assert(graft.operators.Similarity.filteredTopK(
      lonely, e, "vec_id", "embedding", "label", k = 3).count() === 0)
  }

  test("ivf top-k is deterministic across shuffle settings and corpus layout") {
    val e = table("embeddings")
    def run(corpus: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      graft.operators.Similarity.ivfTopK(
        e.where(col("vec_id") < 5), corpus, "vec_id", "embedding",
        k = 3, nlist = 8, nprobe = 3)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val base = run(e)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      // different reducer count AND a different corpus partition layout must
      // leave the quantizer sample — and so every probe result — unchanged
      assert(run(e.repartition(13)) === base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("pq codebook: codes bounded, reconstruction sane, layout-deterministic") {
    val e = table("embeddings")
    val cb = graft.operators.Similarity.pqTrain(e, "vec_id", "embedding",
      m = 8, ksub = 16)
    val enc = e.select(col("vec_id"), cb.encode(col("embedding")).as("codes"))
    val codes = enc.select(explode(col("codes"))).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 16), "codes within [0, ksub)")
    // reconstruction keeps the vector's rough direction: cosine(v, decode)
    // must beat cosine against an unrelated vector by a wide margin
    val rec = enc.join(e, "vec_id")
      .select(graft.functions.exprs.cosineSimilarity(
        col("embedding"), cb.decode(col("codes"))).as("c"))
      .agg(min(col("c"))).as[Double].first()
    assert(rec > 0.3, s"reconstruction cosine too weak: $rec")
    // same codes whatever the corpus layout (id-ordered training prefix)
    val cb2 = graft.operators.Similarity.pqTrain(e.repartition(13),
      "vec_id", "embedding", m = 8, ksub = 16)
    assert(cb2 === cb, "codebook must not depend on partition layout")
  }

  test("ivfpq: full probe + full re-rank ≡ brute force; selective finds the plant") {
    val e = table("embeddings")
    val full = graft.operators.Similarity.ivfpqTopK(
      e.where(col("vec_id") < 5), e, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 8, rerankDepth = 1 << 20)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val brute = graft.operators.Similarity.bruteForceTopK(
      e.where(col("vec_id") < 5), e, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(full === brute,
      "unbounded re-rank over every cell must equal exact search")
    // selective probe + modest ADC shortlist still surfaces the planted
    // jitter copy (cosine ≈ 0.999) at rank 1 for every query
    val planted = graft.queries.PipelineQueries.embeddingsWithPlants(
      spark, sf())
    val sel = graft.operators.Similarity.ivfpqTopK(
      planted.where(col("vec_id") < 10), planted, "vec_id", "embedding",
      k = 1, nlist = 16, nprobe = 8, rerankDepth = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 10L).foreach { q =>
      assert(sel(q) === q + graft.queries.PipelineQueries.PlantShift,
        s"query $q: plant not at rank 1 (got ${sel(q)})")
    }
  }

  test("ivfpq index: train once, query many — repeat calls equal the one-shot form") {
    import spark.implicits._
    val emb = graft.queries.PipelineQueries.embeddingsWithPlants(spark, sf())
    val idx = graft.operators.Similarity.ivfpqIndex(
      emb, "vec_id", "embedding", nlist = 16, m = 8, ksub = 16)
    try {
      val qs1 = emb.where(col("vec_id") < 5)
      val qs2 = emb.where(col("vec_id") >= 5 && col("vec_id") < 10)
      val oneShot = graft.operators.Similarity.ivfpqTopK(
        qs1, emb, "vec_id", "embedding", k = 3, nlist = 16, nprobe = 8,
        rerankDepth = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toSeq
      val viaIndex = idx.topK(qs1, k = 3, nprobe = 8, rerankDepth = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toSeq
      assert(viaIndex === oneShot,
        "cached index must return exactly the one-shot results")
      // a second query set against the SAME trained index (no refit): the
      // planted jitter copy still surfaces at rank 1 for every query
      val second = idx.topK(qs2, k = 1, nprobe = 8, rerankDepth = 16)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
      (5L until 10L).foreach { q =>
        assert(second(q) === q + graft.queries.PipelineQueries.PlantShift)
      }
    } finally idx.unpersist()
  }

  test("lsh index: bucket once, query many — repeat calls equal the one-shot form") {
    import spark.implicits._
    val emb = graft.queries.PipelineQueries.embeddingsWithPlants(spark, sf())
    val idx = graft.operators.Similarity.lshIndex(emb, "vec_id", "embedding")
    try {
      val qs1 = emb.where(col("vec_id") < 5)
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(3))
      val oneShot = graft.operators.Similarity.lshTopK(
        qs1, emb, "vec_id", "embedding", k = 3, probeRadius = 2)
        .collect().map(key).sorted.toSeq
      val viaIndex = idx.topK(qs1, k = 3, probeRadius = 2)
        .collect().map(key).sorted.toSeq
      assert(viaIndex === oneShot,
        "cached index must return exactly the one-shot results")
      // second query set against the SAME bucketed corpus: plants at rank 1
      val second = idx.topK(emb.where(col("vec_id") >= 5 && col("vec_id") < 10),
          k = 1, probeRadius = 2)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
      (5L until 10L).foreach { q =>
        assert(second(q) === q + graft.queries.PipelineQueries.PlantShift)
      }
    } finally idx.unpersist()
  }

  test("bounded top-k aggregation matches the window ranking on ties") {
    import spark.implicits._
    // two queries; query 1 has a cosine tie that must break by id asc
    val scored = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.9), (1L, 13L, 0.1),
      (2L, 10L, 0.5), (2L, 11L, 0.7))
      .toDF("query_id", "neighbor_id", "cosine")
    val got = scored.groupBy($"query_id")
      .agg(graft.functions.exprs.boundedTopK($"cosine", $"neighbor_id", 3).as("nn"))
      .select($"query_id", posexplode($"nn").as(Seq("pos", "nn")))
      .select($"query_id", $"nn.id", ($"pos" + 1).as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(got === Seq((1L, 10L, 1), (1L, 12L, 2), (1L, 11L, 3),
      (2L, 11L, 1), (2L, 10L, 2)).sorted)
  }

  test("bounded top-k takes string ids: UTF8-binary tie-break, no window fallback") {
    import spark.implicits._
    // ties must break by binary string order ("B10" < "b02" in UTF8);
    // repartition(8) forces partial heaps through serialize/merge
    val scored = Seq(
      ("q1", "B10", 0.9), ("q1", "b02", 0.9), ("q1", "a99", 0.8),
      ("q1", "zzz", 0.1), ("q2", "x", 0.5), ("q2", "w", 0.7))
      .toDF("query_id", "neighbor_id", "cosine").repartition(8)
    val got = scored.groupBy($"query_id")
      .agg(graft.functions.exprs.boundedTopK($"cosine", $"neighbor_id", 3).as("nn"))
      .select($"query_id", posexplode($"nn").as(Seq("pos", "nn")))
      .select($"query_id", $"nn.id", ($"pos" + 1).as("rank"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).sorted.toSeq
    assert(got === Seq(("q1", "B10", 1), ("q1", "b02", 2), ("q1", "a99", 3),
      ("q2", "w", 1), ("q2", "x", 2)).sorted)
    // end-to-end: brute-force top-k over STRING ids routes through the
    // same bounded aggregation (the former unbounded-window fallback is gone)
    val emb = graft.queries.PipelineQueries.embeddingsWithPlants(spark, sf())
      .select(concat(lit("v"), col("vec_id")).as("vec_id"), col("embedding"))
    val bf = graft.operators.Similarity.bruteForceTopK(
      emb.where(col("vec_id").isin("v0", "v1")), emb, "vec_id", "embedding", k = 1)
    val winNodes = bf.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(winNodes.isEmpty, "string-id ranking must not use a window")
    val top = bf.select("query_id", "neighbor_id")
      .as[(String, String)].collect().toMap
    assert(top("v0") === s"v${graft.queries.PipelineQueries.PlantShift}")
  }

  test("ivfpq ADC shortlist is a bounded aggregation, not a per-query window sort") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    val emb = graft.queries.PipelineQueries.embeddingsWithPlants(spark, sf())
    val df = graft.operators.Similarity.ivfpqTopK(
      emb.where(col("vec_id") < 5), emb, "vec_id", "embedding",
      k = 3, nlist = 16, nprobe = 8, rerankDepth = 16)
    val plan = df.queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    // NO windows anywhere in the ANN plan: ADC shortlist, final rank AND
    // the coarse cell probe all rank through BoundedTopK aggregations
    assert(windows.isEmpty, s"unexpected windows: $windows")
    val topkAggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.aggregateExpressions.exists(_.exists {
          case ae: AggregateExpression =>
            ae.aggregateFunction.isInstanceOf[graft.functions.BoundedTopK]
          case _ => false
        }) => a }
    assert(topkAggs.size === 3,
      "cell probe, ADC shortlist and final rank must all be BoundedTopK aggregations")
  }

  test("optimize: compacts only multi-small-file partitions, streams the commit, preserves data") {
    val path = tmpDir("opt_dist")
    val mk = (ids: Seq[Long], day: String) =>
      // one task per write → exactly one file per touched partition dir
      ids.map(i => (i, i * 1.5, day)).toDF("id", "v", "day").coalesce(1)
    // day=Mon gets 3 small files; day=Tue exactly one — must stay untouched
    DeltaFixtureWriter.write(mk(Seq(1L, 2L), "Mon"), path, "overwrite", Seq("day"))
    DeltaFixtureWriter.write(mk(Seq(3L, 4L), "Mon"), path, "append", Seq("day"))
    DeltaFixtureWriter.write(mk(Seq(5L), "Mon"), path, "append", Seq("day"))
    DeltaFixtureWriter.write(mk(Seq(6L, 7L), "Tue"), path, "append", Seq("day"))
    val beforeSnap = DeltaLog.snapshot(spark, path)
    val tueFile = beforeSnap.activeFiles
      .where(element_at(col("partitionValues"), "day") === "Tue")
      .select("path").as[String].collect().toSeq
    assert(tueFile.size === 1)
    beforeSnap.unpersist()

    Maintenance.optimize(spark, path)

    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.data.select("id").as[Long].collect().sorted.toSeq ===
      (1L to 7L), "every row survives compaction")
    val byDay = snap.activeFiles
      .groupBy(element_at(col("partitionValues"), "day").as("day")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDay === Map("Mon" -> 1L, "Tue" -> 1L),
      "Mon bin-packed to one file, Tue left alone")
    assert(snap.activeFiles.where(col("path").isin(tueFile: _*)).count() === 1L,
      "the single Tue file was NOT rewritten")
    val metrics = snap.history.where(col("operation") === "OPTIMIZE")
      .select("operationMetrics").collect().head.getMap[String, String](0)
    assert(metrics("num_added_files") === "1" && metrics("num_removed_files") === "3")
    snap.unpersist()

    // a tiny target forces one bin per input file; bins may still merge
    // when (pkey, bin) hash-collide into one shuffle task or AQE coalesces
    // tiny partitions (over-packing, never data loss) — so assert the
    // rewrite happened and data survived, not an exact fan-out
    DeltaFixtureWriter.write(mk(Seq(8L, 9L), "Wed"), path, "append", Seq("day"))
    DeltaFixtureWriter.write(mk(Seq(10L), "Wed"), path, "append", Seq("day"))
    Maintenance.optimize(spark, path, targetFileBytes = 1L, smallFileBytes = 1L << 20)
    val snap2 = DeltaLog.snapshot(spark, path)
    val wedMetrics = snap2.history.where(col("operation") === "OPTIMIZE")
      .orderBy(col("version").desc).limit(1)
      .select("operationMetrics").collect().head.getMap[String, String](0)
    assert(wedMetrics("num_removed_files") === "2", "both Wed files rewritten")
    assert(snap2.data.count() === 10L)
    snap2.unpersist()
  }

  test("commit claim is put-if-absent: a racing writer to one version fails loudly") {
    val path = tmpDir("race")
    DeltaFixtureWriter.write(Seq((1L, "a")).toDF("id", "v"), path,
      "overwrite", Seq())
    val e = intercept[IllegalStateException] {
      DeltaFixtureWriter.logCommit(path, 0L, "VACUUM", Seq())
    }
    assert(e.getMessage.contains("concurrent commit"))
    val e2 = intercept[IllegalStateException] {
      DeltaFixtureWriter.writeCommitStream(path, 0L, "OPTIMIZE", Seq(),
        adds = Iterator.empty, removes = Iterator.empty,
        partitionBy = Seq.empty)
    }
    assert(e2.getMessage.contains("concurrent commit"))
    // the loser never corrupted the winner's commit
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.data.count() === 1L && snap.version === 0L)
    snap.unpersist()
    // and no temp litter survives in the log dir
    val leftovers = new java.io.File(path, "_delta_log").listFiles()
      .map(_.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"temp files leaked: ${leftovers.toSeq}")
  }

  test("changes: CDF shows appends as inserts, deletes as deletes, compaction as nothing") {
    val path = tmpDir("cdf")
    val mk = (ids: Seq[Int], day: String) =>
      ids.map(i => (i.toLong, day)).toDF("id", "day").coalesce(1)
    DeltaFixtureWriter.write(mk(1 to 4, "Mon"), path, "overwrite", Seq("day")) // v0
    DeltaFixtureWriter.write(mk(5 to 6, "Mon"), path, "append", Seq("day"))   // v1
    DeltaFixtureWriter.delete(spark, path, "id >= 3 AND id <= 5")             // v2
    Maintenance.optimize(spark, path, targetFileBytes = 1L << 20)             // v3

    val ch = DeltaLog.changes(spark, path, 0, 3)
      .select("id", "day", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(ch === Set(
      (5L, "Mon", "insert", 1L), (6L, "Mon", "insert", 1L),
      (3L, "Mon", "delete", 2L), (4L, "Mon", "delete", 2L),
      (5L, "Mon", "delete", 2L)),
      "survivor rewrites and the compaction commit must net to zero")

    // window start is exclusive: (1, 2] sees only the delete commit
    val win = DeltaLog.changes(spark, path, 1, 2)
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    assert(win === Set((3L, "delete"), (4L, "delete"), (5L, "delete")))

    // empty window on a metadata-only span
    assert(DeltaLog.changes(spark, path, 2, 3).isEmpty,
      "pure compaction produces no row-level changes")

    // vacuum reclaims the window's dead files → the feed must fail fast,
    // never silently return an incomplete change set
    Maintenance.vacuum(spark, path, retainMs = 0L)
    val gone = intercept[IllegalArgumentException] {
      DeltaLog.changes(spark, path, 0, 2)
    }
    assert(gone.getMessage.contains("no longer on disk"))

    // a window reaching below the retained JSON log (cleaned after a
    // checkpoint) is unrecoverable from state rows → fail fast too
    val ckptV = Maintenance.checkpoint(spark, path)
    (0L to 1L).foreach { i =>
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(path, "_delta_log", f"$i%020d.json"))
    }
    val expired = intercept[IllegalArgumentException] {
      DeltaLog.changes(spark, path, 0, ckptV)
    }
    assert(expired.getMessage.contains("retained JSON log"))
  }

  test("changes: fully-vacuumed table fails fast; empty feed keeps the CDF schema") {
    val path = tmpDir("cdfempty")
    DeltaFixtureWriter.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1), path, "overwrite", Seq())                    // v0
    DeltaFixtureWriter.delete(spark, path, "id >= 0")            // v1: all rows
    Maintenance.vacuum(spark, path, retainMs = 0L)               // v2 + reclaim
    // drop the _SUCCESS markers too, so the table dir holds ONLY
    // _delta_log — the vacuumed-window fail-fast must still fire (an
    // entries.isEmpty early return before the manifest-vs-disk check used
    // to silently yield an empty, schema-less frame)
    new java.io.File(path).listFiles()
      .filter(_.getName.contains("_SUCCESS")).foreach(_.delete())
    assert(new java.io.File(path).listFiles().map(_.getName).toSet
      === Set("_delta_log"))
    val gone = intercept[IllegalArgumentException] {
      DeltaLog.changes(spark, path, 0, 1)
    }
    assert(gone.getMessage.contains("no longer on disk"))
    // a metadata-only window over the empty dir IS a real empty feed —
    // and it must carry the normal CDF columns, not be schema-less
    val feed = DeltaLog.changes(spark, path, 1, 2)
    assert(feed.isEmpty)
    assert(feed.columns.toSeq ===
      Seq("id", "v", "_commit_version", "_change_type"))
  }

  test("zorder: all-null cluster column lands in cell 0 instead of NPE") {
    val path = tmpDir("zordernull")
    val df = Seq((1L, Option.empty[Double]), (2L, None), (3L, None))
      .toDF("id", "score")
    DeltaFixtureWriter.write(df.coalesce(1), path, "overwrite", Seq())
    Maintenance.zorder(spark, path, Seq("score", "id"),
      targetFileBytes = 1L << 20)
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.data.count() === 3L, "rewrite must preserve every row")
    assert(snap.version === 1L)
    snap.unpersist()
  }

  test("zValue: Morton interleave puts bit j of column i at position j*k+i") {
    // a=3 (bits 0,1) → positions 0,2 = 5; b=5 (bits 0,2) → positions 1,5 = 34
    val z = Seq((3L, 5L)).toDF("a", "b")
      .select(Maintenance.zValue(Seq(col("a"), col("b"))).as("z"))
      .as[Long].first()
    assert(z === 39L)
    // one column degenerates to the identity (k=1, positions j*1+0 = j)
    val ident = Seq(12345L).toDF("a")
      .select(Maintenance.zValue(Seq(col("a"))).as("z")).as[Long].first()
    assert(ident === 12345L)
  }

  test("bucket16: monotone, clamped to [0, 65535], constant column → 0") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 999.0).toDF("v")
      .select(Maintenance.bucket16(col("v"), 0.0, 100.0).as("b"))
    val bs = df.as[Long].collect().toSeq
    assert(bs === bs.sorted, "bucketing must preserve order")
    assert(bs.head === 0L && bs.last === 65535L,
      "out-of-range values clamp to the edge cells")
    assert(bs(2) === 32768L, "midpoint lands mid-range")
    val const = Seq(7.0).toDF("v")
      .select(Maintenance.bucket16(col("v"), 7.0, 7.0).as("b"))
      .as[Long].first()
    assert(const === 0L)
  }

  test("zorder: clustered rewrite narrows per-file ranges on every dimension") {
    val path = tmpDir("zorder")
    val n = 64
    // 64×64 grid written range-partitioned by x: a y-predicate prunes nothing
    val grid = spark.range(0, n.toLong * n).select(
      (col("id") / n).cast("long").as("x"),
      (col("id") % n).cast("long").as("y"))
    DeltaFixtureWriter.write(grid.repartitionByRange(16, col("x")), path,
      "overwrite", Seq())

    def filesOverlapping(c: String, lo: Long, hi: Long): (Long, Long) = {
      val snap = DeltaLog.snapshot(spark, path)
      val total = snap.activeFiles.count()
      val hit = snap.dataWithFile.get
        .groupBy(col("__file"))
        .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
        .where(col("mn") <= hi && col("mx") >= lo)
        .count()
      snap.unpersist()
      (hit, total)
    }
    val (hitY0, total0) = filesOverlapping("y", 0, 7)
    assert(total0 === 16L)
    assert(hitY0 === total0, "linear-by-x layout cannot prune on y")

    val snap0 = DeltaLog.snapshot(spark, path)
    val bytes = snap0.detail.select("sizeInBytes").as[Long].first()
    snap0.unpersist()
    Maintenance.zorder(spark, path, Seq("x", "y"),
      targetFileBytes = math.max(1L, bytes / 16))

    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.data.count() === n.toLong * n, "every row survives")
    assert(snap.data.agg(sum(col("x") * 64 + col("y"))).as[Long].first()
      === (0L until n.toLong * n).sum, "cell multiset intact")
    val params = snap.history.where(col("operation") === "OPTIMIZE")
      .orderBy(col("version").desc).limit(1)
      .select("operationParameters").collect().head.getMap[String, String](0)
    assert(params("zOrderBy") === """["x","y"]""")
    snap.unpersist()

    val (hitY, totalZ) = filesOverlapping("y", 0, 7)
    val (hitX, _) = filesOverlapping("x", 0, 7)
    assert(totalZ >= 8L, s"clustered rewrite kept multiple files ($totalZ)")
    assert(hitY <= totalZ * 2 / 3,
      s"y-predicate must now prune files ($hitY of $totalZ overlap)")
    assert(hitX <= totalZ * 2 / 3,
      s"x-predicate must still prune files ($hitX of $totalZ overlap)")
  }

  test("rankCell: balanced tree equals linear boundary count, nulls to top") {
    val bounds = Array(10.0, 20.0, 30.0)
    val df = Seq(Some(5.0), Some(10.0), Some(15.0), Some(20.0), Some(25.0),
      Some(30.0), Some(99.0), None).toDF("v")
      .select(Maintenance.rankCell(col("v"), bounds).as("cell"))
    assert(df.as[Long].collect().toSeq ===
      Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L),
      "cell = count of boundaries < v (boundaries inclusive on the left)")
  }

  test("zorder rankBased: equi-depth cells stay balanced under heavy skew") {
    val path = tmpDir("zorder_skew")
    // 90% of x packed into [0, 64), 10% outliers at ~1e9: equal-width
    // 16-bit cells collapse the dense region into cell 0
    val n = 4096L
    val data = spark.range(0, n).select(
      when(col("id") % 10 =!= 0, col("id") % 64)
        .otherwise(lit(1000000000L) + col("id")).as("x"),
      (col("id") % 64).as("y"))
    DeltaFixtureWriter.write(data.repartitionByRange(16, col("y")), path,
      "overwrite", Seq())
    val snap0 = DeltaLog.snapshot(spark, path)
    val bytes = snap0.detail.select("sizeInBytes").as[Long].first()
    snap0.unpersist()

    Maintenance.zorder(spark, path, Seq("x", "y"),
      targetFileBytes = math.max(1L, bytes / 16), rankBased = true)

    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.data.count() === n, "every row survives")
    // a predicate on the DENSE x region must prune files: with equal-width
    // cells all dense x shares cell 0 and x carries no file-level signal
    val perFile = snap.dataWithFile.get
      .groupBy(col("__file"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val total = perFile.count()
    val hit = perFile.where(col("mn") <= 7L && col("mx") >= 0L).count()
    snap.unpersist()
    assert(total >= 8L, s"clustered rewrite kept multiple files ($total)")
    assert(hit <= total * 2 / 3,
      s"dense-region x-predicate must prune under rank-based cells " +
        s"($hit of $total overlap)")
  }

  test("optimize then vacuum: full maintenance cycle on a churned table") {
    val path = tmpDir("cycle")
    TestFixtures.buildOrphanTable(spark, path)
    Maintenance.optimize(spark, path)
    Maintenance.vacuum(spark, path, retainMs = 0L)
    val m = HealthAnalyzer.analyzeTable(spark, path)
    assert(m.dataFileCount === m.totalFileCount)
    assert(m.orphanFilesCount === 0)
    val perPartition = {
      val snap = DeltaLog.snapshot(spark, path)
      val n = snap.activeFiles
        .groupBy(element_at(col("partitionValues"), "day"),
          element_at(col("partitionValues"), "time"))
        .count().select(max("count")).as[Long].first()
      snap.unpersist(); n
    }
    assert(perPartition === 1L)
  }
}
