package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.CorpusOps

/** Per-language dataset card: counts, dup rate, discrete median, and the
  * quantized quality mean against independently computed scores. */
class CorpusCardSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    ("en", "the cat sat"),          // 3 tokens
    ("en", "the cat sat"),          // exact dup (same fingerprint)
    ("en", "a dog"),                // 2 tokens
    ("en", "one two three four five"), // 5 tokens
    ("fr", "le chat")).toDF("lang", "text")

  test("counts, dup rate, and discrete median per language") {
    val card = CorpusOps.corpusCard(docs, "text", "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    val en = card("en")
    assert(en.getAs[Long]("n_docs") === 4L)
    assert(en.getAs[Long]("n_tokens") === 13L)
    assert(en.getAs[Long]("distinct_texts") === 3L)
    assert(en.getAs[Double]("dup_rate") === 0.25)
    // lengths [3,3,2,5] sorted [2,3,3,5]: quantile_disc(0.5) = ceil(2)=2nd = 3
    assert(en.getAs[Long]("p50_tokens") === 3L)
    val fr = card("fr")
    assert(fr.getAs[Long]("n_docs") === 1L && fr.getAs[Double]("dup_rate") === 0.0)
  }

  test("avg_quality equals the quantized mean of per-doc scores") {
    val perDoc = docs.where(col("lang") === "en")
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    val expected = BigDecimal(
        perDoc.map(q => math.round(q * 1e6)).sum.toDouble / 1e6 / perDoc.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = CorpusOps.corpusCard(docs, "text", "lang")
      .where(col("lang") === "en")
      .collect().head.getAs[Double]("avg_quality")
    assert(got === expected)
  }

  test("median stays exact past the default budget: measured sizing") {
    // 300 docs in one language with a tiny kllBudget: the probe must
    // detect the overflow, grow the budget to the measured max language,
    // and keep p50 == quantile_disc (lengths 1..300 words -> disc median
    // is the 150th order statistic = 150)
    val big = (1 to 300).map(i => ("xx", ("w " * i).trim)).toDF("lang", "text")
    val got = CorpusOps.corpusCard(big, "text", "lang", kllBudget = 64)
      .collect().head
    assert(got.getAs[Long]("n_docs") === 300L)
    assert(got.getAs[Long]("p50_tokens") === 150L)
  }

  test("beyond exactMedianCap the sketch degrades without failing") {
    val big = (1 to 300).map(i => ("xx", ("w " * i).trim)).toDF("lang", "text")
    val got = CorpusOps.corpusCard(big, "text", "lang",
        kllBudget = 64, exactMedianCap = 128)
      .collect().head
    val p50 = got.getAs[Long]("p50_tokens")
    // approximate regime: still a plausible element of the multiset
    assert(p50 >= 1L && p50 <= 300L)
  }
}
