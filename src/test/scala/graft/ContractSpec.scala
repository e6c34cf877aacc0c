package graft

import org.apache.spark.sql.functions._

import graft.functions.exprs
import graft.multimodal.Multimodal
import graft.operators.{Similarity, SkewAnalyzer}

/** Driver-contract guards + cross-module integration. */
class ContractSpec extends SparkSuite {
  import spark.implicits._

  test("every SparkEntry query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf()).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("every oracleSql key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphanOracles = SparkEntry.oracleSql.keySet -- qs
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
  }

  test("bench-only twins run and never shadow contract queries") {
    val overlap = SparkEntry.benchQueries.keySet
      .intersect(SparkEntry.queries.keySet)
    assert(overlap.isEmpty, s"bench twins shadowing contract entries: $overlap")
    SparkEntry.benchQueries.foreach { case (name, fn) =>
      // executes without throwing; row count itself is the twin's business
      assert(fn(spark, sf()).count() >= 0L, s"bench query $name failed")
    }
  }

  test("A4 parity: python tuple-key format") {
    val df = Seq(("Mon", "Dinner", 1)).toDF("day", "time", "x")
    val single = df.select(SkewAnalyzer.pythonTupleKey(Seq("day"))).first().getString(0)
    val multi = df.select(SkewAnalyzer.pythonTupleKey(Seq("day", "time"))).first().getString(0)
    assert(single === "Mon")
    assert(multi === "('Mon', 'Dinner')")
  }

  test("integration: multimodal features feed similarity search") {
    val media = Multimodal.syntheticMedia(spark, 100)
    val feats = Multimodal.decodeFeatures(media, batchSize = 32)
      .toDF()
      .select(col("media_id"), col("feature"))
    val q = feats.where(col("media_id") < 3)
    val knn = Similarity.bruteForceTopK(q, feats, "media_id", "feature", k = 3)
      .collect()
    assert(knn.length === 9)
    assert(knn.forall(r => r.getDouble(2) <= 1.0 + 1e-9))
  }
}
