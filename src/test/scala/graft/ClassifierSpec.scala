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

  test("hashed LR separates class-distinct vocabularies") {
    // plenty of buckets -> no (or few) collisions: the hashed model should
    // learn the same separation a per-token model would
    val train = Seq(
      (1L, 1L, "good clean prose sentence flows"),
      (2L, 1L, "clean prose reads good"),
      (3L, 1L, "sentence flows reads clean"),
      (4L, 0L, "zzqx jjkk wwvv qqpp"),
      (5L, 0L, "jjkk zzqx qqpp mmnn"),
      (6L, 0L, "wwvv mmnn zzqx jjkk")
    ).toDF("id", "label", "text")
    val score = Seq(
      (50L, "good prose flows clean"),
      (51L, "zzqx wwvv jjkk"),
      (52L, "reads good sentence"),
      (53L, "qqpp mmnn zzqx")).toDF("id", "text")
    val preds = Classifier.hashedLogReg(train, score, "id", "label", "text",
        numBuckets = 1 << 16, iters = 8, lr = 4.0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(preds === Map(50L -> 1L, 51L -> 0L, 52L -> 1L, 53L -> 0L))
  }

  test("hashed LR: collisions merge counts (numBuckets=2 ≡ manual merge)") {
    // with B=2 every token lands in bucket 0 or 1 — the model degenerates
    // to (bias, count-in-0, count-in-1). A doc's score must depend only on
    // its per-bucket totals, so two docs with identical bucket totals get
    // identical probabilities even with disjoint tokens
    val train = Seq(
      (1L, 1L, "alpha beta gamma"),
      (2L, 0L, "delta epsilon")).toDF("id", "label", "text")
    val score = Seq(
      (50L, "alpha beta gamma"),
      (51L, "alpha alpha alpha")).toDF("id", "text")
    val out = Classifier.hashedLogReg(train, score, "id", "label", "text",
        numBuckets = 2, iters = 2, lr = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independently derive each token's bucket with the same md5 hash and
    // check the two scored docs agree iff their bucket count-vectors agree
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2
    }
    val v50 = Seq("alpha", "beta", "gamma").groupBy(bucket).map {
      case (b, ts) => b -> ts.size }
    val v51 = Map(bucket("alpha") -> 3)
    if (v50 == v51) assert(out(50L) === out(51L))
    else assert(out(50L) !== out(51L))
  }

  test("hashed LR: determinism, bias-only docs, OOV tokens, validation") {
    val train = Seq(
      (1L, 1L, "alpha beta alpha"),
      (2L, 0L, "gamma delta"),
      (3L, 1L, "beta alpha"),
      (4L, 0L, "delta gamma gamma")).toDF("id", "label", "text")
    val score = Seq(
      (50L, ""),                       // token-free: scored by bias alone
      (51L, "unseen tokens here"),     // all-OOV buckets: weight 0 + bias
      (52L, "alpha beta")).toDF("id", "text")
    def run() = Classifier.hashedLogReg(train, score, "id", "label", "text",
      numBuckets = 64, iters = 3, lr = 1.0).orderBy("id").collect().toSeq
    val a = run()
    assert(a === run(), "two runs must be bit-identical")
    assert(a.map(_.getLong(0)) === Seq(50L, 51L, 52L))
    assert(a.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    // 50 and 51 differ only by buckets absent from training — if none of
    // the OOV tokens collide into a trained bucket their probs must match
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 64
    }
    val trained = Seq("alpha", "beta", "gamma", "delta").map(bucket).toSet
    if (Seq("unseen", "tokens", "here").map(bucket).forall(b => !trained(b)))
      assert(a(0).getDouble(1) === a(1).getDouble(1))
    intercept[IllegalArgumentException] {
      Classifier.hashedLogReg(train, score, "id", "label", "text",
        numBuckets = 1)
    }
    intercept[IllegalArgumentException] {
      Classifier.hashedLogReg(train, score, "id", "label", "text", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Classifier.hashedLogReg(train.limit(0), score, "id", "label", "text")
    }
  }

  test("hashed LR: duplicate (id,label) train rows keep the general path's " +
      "gradient mass (iteration-1 shortcut cardinality, r18 ADVICE)") {
    // The iteration-1 shortcut emits residuals from the train frame; the
    // general path it replaced grouped by (id, __y). With duplicate train
    // rows the shortcut must DEDUPE to one residual per distinct
    // (id, label) or those docs' gradients double. Hand-computed pin:
    // train = the same (1, 1, "alpha") row twice, iters=1, lr=1, n=2.
    //   resid: one row (1, −0.5)    [not two]
    //   grad:  b(alpha): x=2 → −1.0; bias: two rows x=1 → −1.0
    //   w:     +0.5 each → score("alpha") z = 1.0, p = sigmoid(1) round-6.
    // The pre-fix shortcut yields w = +1.0 and p = sigmoid(2) — distinct.
    val train = Seq(
      (1L, 1L, "alpha"),
      (1L, 1L, "alpha")).toDF("id", "label", "text")
    val score = Seq((50L, "alpha")).toDF("id", "text")
    val p = Classifier.hashedLogReg(train, score, "id", "label", "text",
        numBuckets = 1 << 16, iters = 1, lr = 1.0)
      .collect().head.getDouble(1)
    val expected = BigDecimal(1.0 / (1.0 + math.exp(-1.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p === expected)
    // One id under CONFLICTING labels: residuals (1, −0.5) and (1, +0.5)
    // both survive (0.5 − y is injective in y), every joined gradient term
    // cancels, w stays 0 and the scored doc sits at exactly 0.5.
    val conflict = Seq(
      (1L, 1L, "alpha"),
      (1L, 0L, "alpha")).toDF("id", "label", "text")
    val p2 = Classifier.hashedLogReg(conflict, score, "id", "label", "text",
        numBuckets = 1 << 16, iters = 1, lr = 1.0)
      .collect().head.getDouble(1)
    assert(p2 === 0.5)
  }

  test("calibrationBins: hand-computed bins, top-edge fold, exact sums, " +
      "validation") {
    // probs chosen to hit bin 0 (two docs), bin 9 twice (incl. the folded
    // prob=1.0 top edge), and an interior bin; labels make the gaps exact
    val scored = Seq(
      (1L, 0.05, 0L), (2L, 0.049999, 0L),   // bin 0: micro 50000 + 49999
      (3L, 0.55, 1L),                        // bin 5
      (4L, 0.95, 1L), (5L, 1.0, 1L),         // bin 9 (1.0 folds down)
      (6L, 0.92, 0L)                         // bin 9, a miss
    ).toDF("doc_id", "prob", "label")
    val got = Classifier.calibrationBins(scored, "prob", "label")
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got === Array(
      (0L, 2L, 99999L, 0L, 99999L),
      (5L, 1L, 550000L, 1L, 450000L),
      (9L, 3L, 2870000L, 2L, 870000L)))
    // ECE numerator = Σ per-bin gaps; weighted form divides by total n —
    // reconstructable from the returned longs with zero float drift
    assert(got.map(_._5).sum === (99999L + 450000L + 870000L))
    intercept[IllegalArgumentException] {
      Classifier.calibrationBins(scored, "prob", "label", bins = 1)
    }
    intercept[IllegalArgumentException] {
      Classifier.calibrationBins(scored, "prob", "label", bins = 7)
    }
  }
}
