package graft.demo

import org.apache.spark.sql.functions._

import graft.functions.minhashExprs
import graft.operators.Dedup

/** Stage attribution + shape A/B for span_similarity (r18): where do the
  * ~2.8 s go — the winnow-kernel fingerprint pass, the df-cap keep
  * aggregate, or the fp-keyed self-join + pair aggregation — and does a
  * grouped bucket-local pair generation (groupBy(fp) → collect doc list ≤
  * dfCap → local pair explode) beat the classic self-join shape? Verifies
  * row-identity of the two shapes before timing.
  *
  * MEASURED NEGATIVE (r18, sf0.1 local[32]): stages — fingerprint explode
  * 0.77 s, keep agg 0.73 s, full current operator 1.78 s, grouped shape
  * 1.90 s (row-identical, diff 0). The kernel pass dominates and the
  * broadcast-join pairing is already cheap; the grouped shape additionally
  * carries an UNBOUNDED collect_list before its df≤cap filter (a hot
  * boilerplate fingerprint would buffer its whole posting list — the exact
  * state-bound violation the current count-then-filter shape avoids), so
  * it loses on both wall and scale-safety. winnowSimilarity keeps the
  * classic shape; do not re-apply without re-measuring. */
object SpanSimProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.localBuilder(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "spansim-prof")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def med(label: String)(f: => Unit): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"  $label%-34s ${ts(1)}%6.2f s"); ts(1)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    val (k, w, minShared, dfCap) = (8, 4, 3L, 50L)

    // stage legs (uncached, each leg pays its own upstream)
    val fps = docs.select(col("doc_id"),
      explode(minhashExprs.winnowFingerprints(col("text"), k, w)).as("fp"))
    med("fingerprint explode (noop)")(
      fps.write.format("noop").mode("overwrite").save())
    med("keep agg (df<=cap)")(
      fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .where(col("df") <= dfCap)
        .write.format("noop").mode("overwrite").save())
    med("full current operator")(
      Dedup.winnowSimilarity(docs, "doc_id", "text", k, w, minShared, dfCap)
        .write.format("noop").mode("overwrite").save())

    // grouped shape: one fp aggregation carrying the doc list; pairs
    // generated locally per fp from the sorted (ascending => id_a < id_b)
    // list; sizes from the exploded surviving lists
    def grouped() = {
      val g = fps.groupBy(col("fp"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
        .where(size(col("ds")) <= dfCap)
        .select(col("ds"))
        .cache()
      val sizes = g.select(explode(col("ds")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
      val pairs = g
        .where(size(col("ds")) >= 2)
        .select(explode(flatten(transform(col("ds"), (x, i) =>
          transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
            struct(x.as("id_a"), y.as("id_b")))))).as("p"))
        .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
      val out = pairs
        .join(sizes.select(col("doc_id").as("id_a"), col("nfp").as("nfp_a")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("nfp").as("nfp_b")), "id_b")
        .select(col("id_a"), col("id_b"), col("shared"),
          round(col("shared").cast("double") /
            least(col("nfp_a"), col("nfp_b")), 6).as("sim"))
      (g, out)
    }
    // row-identity first
    val (g1, alt) = grouped()
    val cur = Dedup.winnowSimilarity(docs, "doc_id", "text", k, w, minShared, dfCap)
    val diff = cur.exceptAll(alt).count() + alt.exceptAll(cur).count()
    println(s"  shape diff rows: $diff (cur=${cur.count()}, alt=${alt.count()})")
    g1.unpersist(true)
    med("grouped shape (noop)") {
      val (g, out) = grouped()
      out.write.format("noop").mode("overwrite").save()
      g.unpersist(true)
    }
    spark.stop()
  }
}
