package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-shaped window rewrites.
  *
  * W1's sweep line (q4_running_peak) partitions its window by `event_type`
  * — ~5 distinct values — so at 100 TB it degenerates into 5 single-task
  * total sorts. [[chunkedRunningPeak]] is the scale path: the same answer
  * through a three-phase decomposition whose parallelism grows with the
  * data (type × chunk), not with the type cardinality.
  */
object Windows {

  /** Running-peak (max prefix sum of `value` ordered by (ts, tie) per
    * `typ`) computed as a chunked two-phase prefix sum:
    *
    *  1. **in-chunk** (parallel over type × chunk): per-chunk ordered
    *     prefix sums → each chunk's peak and total — the only phase that
    *     touches every row, and its window partitions by (type, chunk), so
    *     task parallelism scales with the time range instead of pinning
    *     each type's entire history to one task;
    *  2. **offsets** (tiny: one row per type × chunk): cumulative sum of
    *     previous chunks' totals per type — a window over the rollup,
    *     thousands of rows where phase 1 had billions;
    *  3. **combine**: global running sum at any row = its chunk's offset +
    *     its in-chunk prefix, so peak(type) = max over chunks of
    *     (offset + chunk peak) — a plain aggregation.
    *
    * `chunkCol` must be monotone non-decreasing in `ts` (e.g.
    * `date_trunc("day", ts)`): equal timestamps then always share a chunk,
    * so (chunk, in-chunk (ts, tie)) is exactly the global (ts, tie) order.
    *
    * NOT the oracle-checked q4 path on purpose: re-associating a DOUBLE
    * summation moves the low bits, and q4's DuckDB lockstep is bit-exact.
    * The OpsSpec equivalence test therefore runs on integral values
    * (exact at any association) — semantics proven, FP caveat documented.
    */
  def chunkedRunningPeak(events: DataFrame, chunkCol: Column,
                         typ: String = "event_type", ts: String = "ts",
                         tie: String = "event_id",
                         value: String = "value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withChunk = events.withColumn("__chunk", chunkCol)
    val wIn = Window.partitionBy(col(typ), col("__chunk"))
      .orderBy(col(ts), col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perChunk = withChunk
      .withColumn("__rs", sum(col(value)).over(wIn))
      .groupBy(col(typ), col("__chunk"))
      .agg(max(col("__rs")).as("__chunk_peak"),
        sum(col(value)).as("__chunk_sum"))
    val wPrev = Window.partitionBy(col(typ)).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perChunk
      .withColumn("__offset",
        // lit(0), not lit(0.0): the integer literal coerces to the value
        // column's own type, so integral inputs stay exact longs through
        // the offset phase instead of being silently widened to double
        coalesce(sum(col("__chunk_sum")).over(wPrev), lit(0)))
      .groupBy(col(typ))
      .agg(max(col("__offset") + col("__chunk_peak")).as("peak"))
  }
}
