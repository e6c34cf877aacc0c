package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** UniMax water-filling allocation and per-group-quota sampling:
  * hand-computed mixed capped/uncapped split, budget-exhausted and
  * epoch-capped regimes, and the variable-quota selection contract. */
class UnimaxSpec extends SparkSuite {
  import spark.implicits._

  private def countsDf(m: (String, Long)*) = m.toSeq.toDF("lang", "n")

  test("hand-computed allocation: capped prefix + even split of surplus") {
    // caps asc: fr 64, de 70, es 73, zh 75, en 218; B=400
    // r: 80, 84, 88.67, 96.5, 118 -> first four capped, t=118
    val got = Sampling.unimaxAllocation(
        countsDf("en" -> 218L, "zh" -> 75L, "es" -> 73L,
          "de" -> 70L, "fr" -> 64L),
        "lang", budget = 400L, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got === Map(
      "fr" -> (64L, 1.0), "de" -> (70L, 1.0), "es" -> (73L, 1.0),
      "zh" -> (75L, 1.0), "en" -> (118L, 0.541284)))
    // the allocation exactly exhausts the budget
    assert(got.values.map(_._1).sum === 400L)
  }

  test("budget >= total cap: every group fully allocated, budget underused") {
    val got = Sampling.unimaxAllocation(
        countsDf("a" -> 10L, "b" -> 20L), "lang",
        budget = 1000L, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("a" -> 10L, "b" -> 20L))
  }

  test("maxEpochs > 1 lets low-resource groups repeat; sample caps at rows") {
    // caps: a=20 (10x2), b=200; B=60: r1=30>=20 capped, t=40
    val alloc = Sampling.unimaxAllocation(
        countsDf("a" -> 10L, "b" -> 100L), "lang",
        budget = 60L, maxEpochs = 2.0)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    assert(alloc === Map("a" -> (20L, 2.0), "b" -> (40L, 0.4)))
    val docs = ((1L to 10L).map(i => (i, "a")) ++
      (100L to 199L).map(i => (i, "b"))).toDF("doc_id", "lang")
    val sel = Sampling.unimaxSample(docs, "doc_id", "lang",
        budget = 60L, maxEpochs = 2.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a's quota 20 caps at its 10 physical rows; b takes its 40
    assert(sel === Map("a" -> 10L, "b" -> 40L))
  }

  test("uniform regime: nobody capped, equal shares") {
    val got = Sampling.unimaxAllocation(
        countsDf("x" -> 100L, "y" -> 200L, "z" -> 300L), "lang",
        budget = 150L, maxEpochs = 1.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("x" -> 50L, "y" -> 50L, "z" -> 50L))
  }

  test("quotaPerGroups: per-group quotas enforced, missing groups dropped") {
    val docs = ((1L to 30L).map(i => (i, "big")) ++
      (31L to 40L).map(i => (i, "small")) ++
      (41L to 45L).map(i => (i, "unbudgeted"))).toDF("doc_id", "lang")
    val quotas = Seq(("big", 5L), ("small", 10L)).toDF("lang", "quota")
    val got = Sampling.quotaPerGroups(docs, "doc_id", "lang", quotas)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("big" -> 5L, "small" -> 10L))
    // same md5-priority order as the constant-quota operator
    val const = Sampling.quotaPerGroup(
        docs.where(col("lang") === "big"), "doc_id", "lang", 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val varq = got.where(col("lang") === "big")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(const === varq)
  }

  test("epochManifest: hand-computed repetition rows, fractional winner " +
      "is md5-minimal, deterministic") {
    // A: 2 docs, B: 10 docs, budget 10, maxEpochs 3. Allocation (water
    // fill): caps 6/30, ladder r_A = 10/2 = 5, r_B = (10-6)/1 = 4, both
    // uncapped -> t = 5, quotas 5/5 (budget exactly used). Manifest:
    // A fullE = 5/2 = 2 (both docs epochs {0,1}) + rem 1 (the md5-min doc
    // also epoch 2); B fullE = 0, rem 5 (top-5 of 10 at epoch 0).
    val docs = ((1L to 2L).map(i => (i, "A")) ++
      (11L to 20L).map(i => (i, "B"))).toDF("doc_id", "lang")
    val got = Sampling.epochManifest(docs, "doc_id", "lang",
        budget = 10L, maxEpochs = 3.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length === 10, s"budget must be exactly used: ${got.length}")
    val aRows = got.filter(_._2 == "A")
    assert(aRows.count(_._3 == 0L) === 2 && aRows.count(_._3 == 1L) === 2,
      s"both A docs must run 2 full epochs: ${aRows.toSeq}")
    val aFrac = aRows.filter(_._3 == 2L).map(_._1)
    // md5 priority = (2-hex bucket, id): doc 1 vs doc 2
    val md5min = Seq(1L, 2L).minBy(i => {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
      ((h(0) & 0xFF), i)
    })
    assert(aFrac.toSeq === Seq(md5min),
      s"fractional epoch must go to the md5-priority winner: $aFrac")
    val bRows = got.filter(_._2 == "B")
    assert(bRows.length === 5 && bRows.forall(_._3 == 0L),
      s"B gets a 5-doc fractional epoch 0: ${bRows.toSeq}")
    // deterministic under rerun
    val rerun = Sampling.epochManifest(docs, "doc_id", "lang",
        budget = 10L, maxEpochs = 3.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sorted.toSeq === rerun.sorted.toSeq)
  }

  test("group-cardinality guard: high-cardinality key fails loudly") {
    val many = (1L to 50L).map(i => (s"g$i", 10L)).toDF("lang", "n")
    val e = intercept[IllegalArgumentException] {
      Sampling.unimaxAllocation(many, "lang", budget = 100L,
        maxEpochs = 1.0, maxGroups = 10).collect()
    }
    assert(e.getMessage.contains("maxGroups"))
    // at-the-cap cardinality still works
    val ok = Sampling.unimaxAllocation(many, "lang", budget = 100L,
      maxEpochs = 1.0, maxGroups = 50)
    assert(ok.count() === 50L)
  }

  test("qualityFloor: per-group discrete p25 cutoff, ties kept, " +
      "measured quantile convention, validation") {
    // discrete-quantile convention MEASURED against DuckDB quantile_disc
    // (the oracle side): n=4 at p=0.25 -> rank-1 element (all kept),
    // n=5 -> rank-2 element (exactly the worst row dropped) — both
    // engines agree (probe recorded in the round-14 BASELINE notes)
    val df = Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 3.0),
      (4L, "A", 4.0),
      (5L, "B", 10.0), (6L, "B", 20.0), (7L, "B", 30.0), (8L, "B", 40.0),
      (9L, "B", 50.0)).toDF("id", "g", "score")
    val got = Sampling.qualityFloor(df, "id", "g", "score", p = 0.25)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got === Array(
      (1L, "A", 1.0, 1.0), (2L, "A", 2.0, 1.0), (3L, "A", 3.0, 1.0),
      (4L, "A", 4.0, 1.0),
      (6L, "B", 20.0, 20.0), (7L, "B", 30.0, 20.0), (8L, "B", 40.0, 20.0),
      (9L, "B", 50.0, 20.0)))
    // ties AT the cutoff survive (>= keeps the quantile element), so the
    // kept fraction can never fall below 1-p
    val ties = Seq((1L, "C", 5.0), (2L, "C", 5.0), (3L, "C", 5.0),
      (4L, "C", 9.0)).toDF("id", "g", "score")
    assert(Sampling.qualityFloor(ties, "id", "g", "score").count() === 4L)
    intercept[IllegalArgumentException] {
      Sampling.qualityFloor(df, "id", "g", "score", p = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.qualityFloor(df, "id", "g", "score", p = 1.0)
    }
    // degenerate -Inf-cutoff group (r17 ADVICE): when >= p of a group's
    // scores are literal -Inf the cutoff is itself -Inf, and -Inf >= -Inf
    // would pass — the explicit exclusion keeps NULL and literal--Inf
    // scores null-equivalent (dropped) even in that regime, matching the
    // docblock's "they never qualify" claim
    val degen = Seq((1L, "D", Double.NegativeInfinity),
      (2L, "D", Double.NegativeInfinity), (3L, "D", Double.NegativeInfinity),
      (4L, "D", 7.0)).toDF("id", "g", "score")
    val keptDegen = Sampling.qualityFloor(degen, "id", "g", "score", p = 0.5)
      .collect().map(_.getLong(0)).sorted
    assert(keptDegen === Array(4L),
      "-Inf scores must never pass the floor, even at an -Inf cutoff")
    // NULL scores behave identically (null -> -Inf coalesce path)
    val withNull = Seq((1L, "E", Some(Double.NegativeInfinity)),
      (2L, "E", None: Option[Double]), (3L, "E", Some(2.0)),
      (4L, "E", Some(3.0))).toDF("id", "g", "score")
    val keptNull = Sampling.qualityFloor(withNull, "id", "g", "score", p = 0.5)
      .collect().map(_.getLong(0)).sorted
    assert(!keptNull.contains(1L) && !keptNull.contains(2L))
  }
}
