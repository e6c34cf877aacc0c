package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Sampling}

/** Scoped cache ownership (r13 verdict item 8): a library caller outside
  * the bench loop must get deterministic release of the pipelines'
  * tracked persists — without reaching for the session-global
  * unpersistAll(). */
class CacheScopeSpec extends SparkSuite {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("withCaches releases every tracked persist created inside the " +
      "scope — zero leaked RDDs for a library caller") {
    Dedup.unpersistAll() // start from this suite's own clean slate
    val docs = table("documents").select(col("doc_id"), col("text"))
    val before = persistedIds
    val (nPairs, nKept) = Dedup.withCaches {
      // two pipelines that track persists internally: the LSH signature
      // caches (minhashPairs) and the token-budget sampler's bucket pin
      val pairs = Dedup.minhashPairs(docs, "doc_id", "text").count()
      val kept = Sampling.tokenBudgetSample(
        docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budget = 500L).count()
      (pairs, kept)
    }
    assert(nKept > 0)
    assert(nPairs >= 0)
    val leaked = persistedIds -- before
    assert(leaked.isEmpty,
      s"withCaches leaked ${leaked.size} persisted RDDs: $leaked")
  }

  test("withCaches releases ONLY its own scope: outer tracked frames " +
      "survive, nested scopes release LIFO, exceptions still release") {
    Dedup.unpersistAll()
    val outer = Dedup.track(
      Seq((1L, "a"), (2L, "b")).toDF("id", "t").cache())
    outer.count()
    val outerIds = persistedIds
    assert(outerIds.nonEmpty, "outer cache must be persisted")
    // nested scope: inner tracks + releases, outer cache untouched
    Dedup.withCaches {
      val inner = Dedup.track(
        Seq((3L, "c")).toDF("id", "t").cache())
      inner.count()
      assert(persistedIds.size > outerIds.size)
    }
    assert(persistedIds === outerIds,
      "inner scope must release exactly its own additions")
    // exception path: the scope still releases
    intercept[RuntimeException] {
      Dedup.withCaches {
        Dedup.track(Seq((4L, "d")).toDF("id", "t").cache()).count()
        throw new RuntimeException("boom")
      }
    }
    assert(persistedIds === outerIds, "exception path must still release")
    // the outer frame is still owned by the global registry
    Dedup.unpersistAll()
    assert(persistedIds.isEmpty)
  }
}
