package graft

import scala.util.Random

import graft.deltalog.{DeltaFixtureWriter, DeltaLog}

/** Model-based check of the whole log layer: random sequences of
  * overwrite/append/delete/compact/merge are applied both to a real
  * log-backed table and to an in-memory model; after EVERY operation the
  * replayed snapshot must equal the model (as a multiset of rows). This is
  * the strongest correctness evidence for replay ordering, file rewrite
  * targeting, and upsert semantics interacting in arbitrary orders. */
object LogReplayModelSpec {
  // top-level so Spark can generate its encoder
  case class R(id: Long, value: Double, day: String)
}

class LogReplayModelSpec extends SparkSuite {
  import spark.implicits._
  import LogReplayModelSpec.R

  private def toDF(rows: Seq[R]) =
    rows.toDF()   // columns: id, value, day

  test("random op sequences: replayed snapshot == model after every op") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val path = tmpDir(s"model$seed")
      var nextId = 0L
      def mkRows(n: Int): Seq[R] = {
        val rows = (0 until n).map { _ =>
          val r = R(nextId, (rnd.nextInt(200)).toDouble,
            Seq("Mon", "Tue", "Wed")(rnd.nextInt(3)))
          nextId += 1
          r
        }
        rows
      }

      var model: Vector[R] = mkRows(30).toVector
      DeltaFixtureWriter.write(toDF(model), path, "overwrite", Seq("day"))

      // CDF invariant state: the last verified (version, model) pair
      var cdfBase: (Long, Vector[R]) = (0L, model)

      def assertMatches(opName: String): Unit = {
        val snap = DeltaLog.snapshot(spark, path)
        val version = snap.version
        val got =
          if (snap.dataWithFile.isEmpty) Seq.empty
          else snap.data.select("id", "value", "day").as[R].collect().toSeq
        snap.unpersist()
        assert(got.sortBy(_.id) === model.sortBy(_.id),
          s"seed=$seed after $opName")
        // change-data-feed invariant: the feed between the last verified
        // version and now, applied to the old model, reproduces the new one
        // (rows are unique per (id, value) here, so set arithmetic is the
        // multiset arithmetic)
        if (version > cdfBase._1) {
          val ch = DeltaLog.changes(spark, path, cdfBase._1, version)
            .select($"id", $"value", $"day", $"_change_type")
            .as[(Long, Double, String, String)].collect()
          val ins = ch.collect { case (i, v, d, "insert") => R(i, v, d) }.toSet
          val del = ch.collect { case (i, v, d, "delete") => R(i, v, d) }.toSet
          val applied = (cdfBase._2.toSet -- del) ++ ins
          assert(applied === model.toSet,
            s"seed=$seed after $opName: CDF(${cdfBase._1}, $version] does " +
              "not transform the old snapshot into the new one")
        }
        cdfBase = (version, model)
      }
      assertMatches("initial overwrite")

      (1 to 8).foreach { step =>
        rnd.nextInt(8) match {
          case 0 => // append
            val rows = mkRows(5 + rnd.nextInt(10))
            DeltaFixtureWriter.write(toDF(rows), path, "append", Seq("day"))
            model = model ++ rows
            assertMatches(s"step$step append")
          case 1 => // predicate delete
            val cut = rnd.nextInt(200)
            DeltaFixtureWriter.delete(spark, path, s"value > $cut")
            model = model.filterNot(_.value > cut)
            assertMatches(s"step$step delete>$cut")
          case 2 => // compact
            DeltaFixtureWriter.compact(spark, path)
            assertMatches(s"step$step compact")
          case 3 => // merge upsert: update some existing + insert new
            val updates = rnd.shuffle(model).take(math.min(5, model.size))
              .map(r => r.copy(value = r.value + 1000))
            val inserts = mkRows(3)
            val src = updates ++ inserts
            if (src.nonEmpty) {
              DeltaFixtureWriter.merge(spark, path, toDF(src), Seq("id"))
              val updatedIds = updates.map(_.id).toSet
              model = model.filterNot(r => updatedIds.contains(r.id)) ++ src
            }
            assertMatches(s"step$step merge")
          case 4 => // overwrite with fresh rows
            val rows = mkRows(10 + rnd.nextInt(10))
            DeltaFixtureWriter.write(toDF(rows), path, "overwrite", Seq("day"))
            model = rows.toVector
            assertMatches(s"step$step overwrite")
          case 5 => // checkpoint mid-sequence: replay + every LATER op must
                    // keep working on top of the parquet checkpoint
            graft.operators.Maintenance.checkpoint(spark, path)
            assertMatches(s"step$step checkpoint")
          case 6 => // vacuum mid-sequence: physically deletes dead files,
                    // active data untouched
            graft.operators.Maintenance.vacuum(spark, path, retainMs = 0L)
            assertMatches(s"step$step vacuum")
          case 7 => // zorder rewrite: clustering preserves every row and,
                    // like compaction, nets to ZERO in the change feed
            graft.operators.Maintenance.zorder(spark, path, Seq("value"),
              targetFileBytes = 1L << 20)
            assertMatches(s"step$step zorder")
        }
      }
      // final: maintenance cycle leaves data intact
      graft.operators.Maintenance.checkpoint(spark, path)
      graft.operators.Maintenance.vacuum(spark, path, retainMs = 0L)
      assertMatches("post checkpoint+vacuum")
    }
  }

  test("schema evolution survives delete/compact/merge/checkpoint/vacuum") {
    import org.apache.spark.sql.functions._
    val path = tmpDir("evolve")
    DeltaFixtureWriter.write(
      toDF(Seq(R(0, 10, "Mon"), R(1, 120, "Tue"), R(2, 30, "Mon"))),
      path, "overwrite", Seq("day"))
    // evolving append: adds `tag`; older rows must read it as null
    DeltaFixtureWriter.write(
      toDF(Seq(R(3, 140, "Tue"), R(4, 50, "Mon"))).withColumn("tag", lit("v2")),
      path, "append", Seq("day"))
    def rows() = {
      val snap = DeltaLog.snapshot(spark, path)
      val got = snap.data.select("id", "value", "day", "tag")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
          Option(r.getString(3)))).toSeq.sortBy(_._1)
      snap.unpersist(); got
    }
    assert(rows() === Seq(
      (0L, 10.0, "Mon", None), (1L, 120.0, "Tue", None), (2L, 30.0, "Mon", None),
      (3L, 140.0, "Tue", Some("v2")), (4L, 50.0, "Mon", Some("v2"))))
    // delete rewrites an old (pre-evolution) file WITH the evolved schema
    DeltaFixtureWriter.delete(spark, path, "value > 100")
    assert(rows() === Seq(
      (0L, 10.0, "Mon", None), (2L, 30.0, "Mon", None), (4L, 50.0, "Mon", Some("v2"))))
    // compact rewrites everything under the evolved schema; nulls survive
    DeltaFixtureWriter.compact(spark, path)
    assert(rows() === Seq(
      (0L, 10.0, "Mon", None), (2L, 30.0, "Mon", None), (4L, 50.0, "Mon", Some("v2"))))
    // merge after evolution: update one, insert one, tag values kept
    DeltaFixtureWriter.merge(spark, path,
      toDF(Seq(R(2, 31, "Mon"), R(5, 60, "Tue"))).withColumn("tag", lit("v3")),
      Seq("id"))
    assert(rows() === Seq(
      (0L, 10.0, "Mon", None), (2L, 31.0, "Mon", Some("v3")),
      (4L, 50.0, "Mon", Some("v2")), (5L, 60.0, "Tue", Some("v3"))))
    // maintenance cycle: checkpoint carries the latest metaData (evolved
    // schema) and vacuum only removes dead files
    graft.operators.Maintenance.checkpoint(spark, path)
    graft.operators.Maintenance.vacuum(spark, path, retainMs = 0L)
    assert(rows() === Seq(
      (0L, 10.0, "Mon", None), (2L, 31.0, "Mon", Some("v3")),
      (4L, 50.0, "Mon", Some("v2")), (5L, 60.0, "Tue", Some("v3"))))
    val snap = DeltaLog.snapshot(spark, path)
    assert(snap.tableSchema.exists(_.fieldNames.contains("tag")),
      "post-checkpoint replay still reports the evolved schema")
    snap.unpersist()
  }
}
