package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward AS-OF join — "for each left row, the latest right row with
  * right.ts <= left.ts and equal keys" — the timeseries primitive Spark has
  * no built-in operator for (delta-rs/DuckDB/kdb all ship one).
  *
  * Implemented with the UNION + running-last trick rather than a range
  * join: tag both inputs, union them, and take `last(payload, ignoreNulls)`
  * over a (keys)-partitioned, (ts, side)-ordered window bounded to the
  * current row. One shuffle on the join keys and one in-partition sort —
  * O(n log n) per key group — where a naive range join materializes every
  * (left, right-candidates) pair first (quadratic per key under wide time
  * windows, the classic range-join blowup Spark's optimizer cannot avoid
  * without bounds).
  *
  * Tie semantics: a right row AT the left row's timestamp matches
  * (backward-inclusive, DuckDB `ASOF JOIN ... ON l.ts >= r.ts` parity) —
  * the right side sorts BEFORE the left at equal ts. Among multiple right
  * rows with identical (keys, ts) the LAST in (ts, side) order wins, which
  * is only deterministic if (keys, ts) is unique on the right — pre-reduce
  * the right side (e.g. max_by) when it is not.
  *
  * Scale notes: a hot key concentrates its whole history in one task (the
  * window needs the full per-key ordered run — salting would break
  * correctness); mitigate upstream by time-bucketing the key (join on
  * (key, day) and union day boundaries) if a single key's history exceeds
  * a task. AQE skew-split cannot help windows, so this is a data-model
  * decision, not a conf one.
  */
object AsOfJoin {

  /** @param left     probe side (all its columns are preserved)
    * @param right    build side; must contain `keys`, `tsCol`, and `payload`
    * @param keys     equi-join key columns (present on both sides)
    * @param tsCol    event-time column (orderable; present on both sides)
    * @param payload  right columns to carry onto matches
    * @param prefix   prefix for the carried payload columns (avoids clashes)
    * @return left rows + `prefix`-ed payload of the as-of match (nulls when
    *         no right row at or before the left timestamp) */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, payload: Seq[String],
                   prefix: String = "asof_"): DataFrame = {
    require(payload.nonEmpty, "asofBackward needs at least one payload column")
    val leftCols = left.columns.toSeq
    // one struct column carries the whole payload so a single running-last
    // resolves all of it atomically (per-column lasts could mix rows)
    val payloadStruct = struct(payload.map(col): _*)
    val lTagged = left
      .withColumn("__p", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
      .withColumn("__side", lit(1))
    val rTagged = right
      .select((keys :+ tsCol).map(col) :+ payloadStruct.as("__p"): _*)
      .withColumn("__side", lit(0))
    // align: right rows null-fill the left-only columns
    val rAligned = leftCols.foldLeft(rTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(lTagged.columns.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rAligned)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__m.$p").as(s"$prefix$p")): _*)
  }
}
