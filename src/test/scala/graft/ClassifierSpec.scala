package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** Multinomial Naive Bayes classifier: hand-computed tiny-model values,
  * real class separation on a class-distinct-vocabulary corpus, the
  * OOV-token and prior-fallback contracts, and argmax tie determinism. */
class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed two-class model") {
    // train: class a = {apple apple banana}, class b = {dog}
    // V = 3 (apple, banana, dog); priors: a = ln(2/3), b = ln(1/3)
    val train = Seq(
      (1L, "a", "apple apple"),
      (2L, "a", "banana"),
      (3L, "b", "dog")
    ).toDF("id", "cls", "text")
    val score = Seq((10L, "apple dog")).toDF("id", "text")
    val got = Classifier.naiveBayes(train, score, "id", "cls", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // class a totals 3 tokens, class b totals 1
    // score(a) = ln(2/3) + ln((2+.5)/(3+1.5)) + ln((0+.5)/(3+1.5))
    // score(b) = ln(1/3) + ln((0+.5)/(1+1.5)) + ln((1+.5)/(1+1.5))
    val sa = round6(round9(math.log(2.0 / 3)) +
      round9(math.log(2.5 / 4.5)) + round9(math.log(0.5 / 4.5)))
    val sb = round6(round9(math.log(1.0 / 3)) +
      round9(math.log(0.5 / 2.5)) + round9(math.log(1.5 / 2.5)))
    val expected = if (sa >= sb) ("a", sa) else ("b", sb)
    assert(got === Array((10L, expected._1, expected._2)))
  }

  test("separable vocabularies classify correctly") {
    // genuinely separable classes (unlike the shared-vocabulary testdata
    // corpus): fruit-vocab docs vs animal-vocab docs
    val train = Seq(
      (1L, "fruit", "apple banana cherry apple"),
      (2L, "fruit", "banana cherry banana plum"),
      (3L, "fruit", "plum apple cherry"),
      (4L, "animal", "dog elephant fox dog"),
      (5L, "animal", "fox wolf dog elephant"),
      (6L, "animal", "wolf fox elephant")
    ).toDF("id", "cls", "text")
    val score = Seq(
      (10L, "apple plum banana"),
      (11L, "cherry apple"),
      (12L, "dog wolf"),
      (13L, "elephant fox wolf dog")
    ).toDF("id", "text")
    val preds = Classifier.naiveBayes(train, score, "id", "cls", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds === Map(10L -> "fruit", 11L -> "fruit",
      12L -> "animal", 13L -> "animal"))
  }

  test("OOV-only doc falls back to the max-prior class; min-label ties") {
    val train = Seq(
      (1L, "big", "apple"),
      (2L, "big", "banana"),
      (3L, "small", "dog")
    ).toDF("id", "cls", "text")
    val score = Seq(
      (10L, "zebra quark"), // fully OOV: prior-only scoring
      (11L, "")             // no tokens at all: same fallback
    ).toDF("id", "text")
    val got = Classifier.naiveBayes(train, score, "id", "cls", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    val bigPrior = round6(round9(math.log(2.0 / 3)))
    assert(got === Array((10L, "big", bigPrior), (11L, "big", bigPrior)))

    // equal priors → equal prior-only scores → tie broken by MIN label
    val trainTie = Seq(
      (1L, "beta", "apple"),
      (2L, "alpha", "dog")
    ).toDF("id", "cls", "text")
    val tied = Classifier.naiveBayes(
        trainTie, Seq((10L, "zebra")).toDF("id", "text"), "id", "cls", "text")
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    assert(tied === Array(("alpha", round6(round9(math.log(0.5))))))
  }

  test("every scored doc gets exactly one prediction row") {
    val train = Seq((1L, "x", "apple"), (2L, "y", "dog")).toDF("id", "cls", "text")
    val score = (10L to 30L).map(i => (i, if (i % 2 == 0) "apple" else "dog"))
      .toDF("id", "text")
    val out = Classifier.naiveBayes(train, score, "id", "cls", "text")
    assert(out.count() === 21)
    assert(out.select("id").distinct().count() === 21)
  }

  test("reserved __ namespace rejected") {
    val df = Seq((1L, "x", "t")).toDF("__id", "cls", "text")
    intercept[IllegalArgumentException] {
      Classifier.naiveBayes(df, df, "__id", "cls", "text")
    }
  }

  test("logistic regression separates length-distinct classes") {
    import spark.implicits._
    // class 1: long docs (many tokens), class 0: two-token docs — the f1
    // length feature alone is fully separable, so 3 GD steps must push
    // every prediction to the right side of 0.5
    val longDoc = (1 to 60).map(i => s"w$i").mkString(" ")
    val train = ((1L to 20L).map(i => (i, 1L, s"$longDoc extra$i")) ++
      (21L to 40L).map(i => (i, 0L, s"short one$i"))).toDF("id", "label", "text")
    val score = Seq((100L, (1 to 50).map(i => s"v$i").mkString(" ")),
      (101L, "tiny doc")).toDF("id", "text")
    val out = Classifier.logisticQuality(train, score, "id", "label", "text",
        iters = 8, lr = 2.0)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out(100L)._2 === 1L, s"long doc should classify 1, got ${out(100L)}")
    assert(out(101L)._2 === 0L, s"short doc should classify 0, got ${out(101L)}")
    assert(out(100L)._1 > out(101L)._1)
  }

  test("logistic regression: determinism, degenerate docs, validation") {
    import spark.implicits._
    val train = ((1L to 10L).map(i => (i, (i % 2), s"alpha beta doc $i")) :+
      (11L, 1L, "")).toDF("id", "label", "text")
    val score = Seq((50L, ""), (51L, "alpha beta")).toDF("id", "text")
    def run() = Classifier.logisticQuality(train, score, "id", "label", "text")
      .orderBy("id").collect().toSeq
    val a = run()
    assert(a === run(), "two runs must be bit-identical")
    // empty doc is scored by bias alone: prob present, in [0,1]
    assert(a.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    assert(a.map(_.getLong(0)) === Seq(50L, 51L))
    intercept[IllegalArgumentException] {
      Classifier.logisticQuality(train, score, "id", "label", "text", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Classifier.logisticQuality(train, score, "id", "label", "text", lr = 0.0)
    }
    intercept[IllegalArgumentException] {
      Classifier.logisticQuality(train.limit(0), score, "id", "label", "text")
    }
  }
}
