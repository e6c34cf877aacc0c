package graft

import org.apache.spark.sql.functions._

import graft.operators.LanguageModel

/** DSIR importance weighting: hand-computed unigram likelihoods (OOV stays
  * in the denominator), target-affinity ordering, the selection-quantile
  * contract, and the degenerate target==source case. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("unigramAvgLl: hand-computed model, OOV in denominator") {
    // model: apple ×2, banana ×1 → N=3, V=2
    val train = Seq((1L, "apple apple"), (2L, "banana")).toDF("id", "text")
    val score = Seq(
      (10L, "apple zebra"), // zebra is OOV: smoothed zero, still counted
      (11L, "")             // token-free: (0, 0.0)
    ).toDF("id", "text")
    val got = LanguageModel.unigramAvgLl(train, score, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val lpApple = round9(math.log(2.5 / 4.0))
    val lpZebra = round9(math.log(0.5 / 4.0))
    assert(got === Array(
      (10L, 2L, round6((lpApple + lpZebra) / 2.0)),
      (11L, 0L, 0.0)))
  }

  test("dsirWeights: target-like docs outrank source-like and get selected") {
    val target = Seq((1L, "piano violin cello piano"),
      (2L, "violin piano flute")).toDF("id", "text")
    val source = Seq((1L, "piano violin cello piano"),
      (2L, "violin piano flute"),
      (3L, "gravel cement asphalt"), (4L, "cement gravel brick"),
      (5L, "asphalt brick cement gravel")).toDF("id", "text")
    val score = Seq(
      (10L, "piano cello violin"),   // target-like
      (11L, "cement asphalt gravel"), // source-only-like
      (12L, "piano gravel")           // mixed
    ).toDF("id", "text")
    val rows = LanguageModel.dsirWeights(target, source, score, "id", "text",
        selectFraction = 0.34)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(4), r.getLong(5))).toMap
    assert(rows(10L)._1 > rows(12L)._1)
    assert(rows(12L)._1 > rows(11L)._1)
    // top ~third of 3 docs: only the target-like doc is selected
    assert(rows(10L)._2 === 1L)
    assert(rows(11L)._2 === 0L)
    assert(rows(12L)._2 === 0L)
  }

  test("dsirWeights: target==source degenerates to weight 0, all selected") {
    val corpus = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("id", "text")
    val score = Seq((10L, "alpha"), (11L, "gamma beta")).toDF("id", "text")
    val rows = LanguageModel.dsirWeights(corpus, corpus, score, "id", "text")
      .collect().map(r => (r.getDouble(4), r.getLong(5)))
    assert(rows.forall { case (w, s) => w === 0.0 && s === 1L })
  }

  test("dsirWeights: selectFraction 0.9 cuts at the exact 0.1 percentile") {
    // 0.9 is the literal-formatting hazard: 1.0 - 0.9 in double arithmetic
    // prints 0.09999999999999998; the threshold must be the decimal-exact
    // percentile(weight, 0.1) — verified against a driver-side replay of
    // Spark's interpolated-percentile formula at fraction exactly 0.1
    val target = Seq((100L, "alpha alpha alpha")).toDF("id", "text")
    val source = Seq((200L, "zeta zeta zeta")).toDF("id", "text")
    val score = (1L to 20L).map(i =>
      (i, (("alpha " * i.toInt) + ("zeta " * (20 - i).toInt)).trim))
      .toDF("id", "text")
    val rows = LanguageModel.dsirWeights(target, source, score, "id", "text",
      selectFraction = 0.9).collect()
    val ws = rows.map(_.getDouble(4)).sorted
    assert(ws.distinct.length === ws.length, "fixture needs distinct weights")
    val idx = 0.1 * (ws.length - 1)
    val lo = idx.toInt
    val th = BigDecimal(ws(lo) + (idx - lo) * (ws(lo + 1) - ws(lo)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = rows.filter(_.getDouble(4) >= th).map(_.getLong(0)).toSet
    val selected = rows.filter(_.getLong(5) == 1L).map(_.getLong(0)).toSet
    assert(selected === expect)
    assert(selected.size >= 17 && selected.size <= 19)
  }
}
