package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable per-key ranking: `row_number() OVER (PARTITION BY key ORDER BY
  * ord)` without ever materializing a per-key window partition.
  *
  * `Window.partitionBy(key)` routes every row of a key through ONE task —
  * fine when the key is high-cardinality (user_id), a scale-killer when the
  * key has a handful of values (event_type: at 100 TB each type's entire
  * timeline would sort through a single task). This helper is the bounded
  * form, the keyed analog of [[GlobalIndex]]:
  *
  *  1. bucket rows by a caller-supplied coarsening of the leading order
  *     column (e.g. `date_trunc("hour", ts)` when ordering by `ts`) — the
  *     bucket MUST be a non-decreasing function of the order prefix so that
  *     bucket order agrees with row order;
  *  2. one tiny aggregate counts rows per (key, bucket); a window over that
  *     metadata-scale frame turns counts into cumulative offsets (and the
  *     per-key total);
  *  3. offsets broadcast-join back; rank = offset + row_number within the
  *     (key, bucket) window — partitions bounded by bucket granularity, so
  *     cardinality grows with the data span and no task ever sees more
  *     than one bucket of one key.
  *
  * The bucket-count frame is keys × buckets rows (types × hours here) —
  * broadcastable at any realistic span. [[adaptiveTimeBucket]] derives the
  * granularity (hour/day/month) from a one-row min/max(ts) aggregate so
  * the offsets frame stays under [[MaxBuckets]] per key on ANY corpus
  * span — hour for up to ~7.5 years, day to ~179 years, month beyond —
  * with no caller tuning. Results are identical to the single-window form
  * for any unique ordering (the rank does not depend on the coarsening).
  */
object KeyedRank {

  /** Per-key bucket-count ceiling for [[adaptiveTimeBucket]]: 2^16 buckets
    * × a handful of keys × ~32 bytes/row keeps the offsets frame far under
    * any broadcast threshold. */
  val MaxBuckets: Long = 65536L

  /** Span-adaptive coarsening of a timestamp order column: ONE metadata
    * min/max aggregate over `df` (runs at plan-construction time — the
    * model-scale-collect discipline: one row, never the data) picks the
    * coarsest-needed `date_trunc` unit so the (key, bucket) offset frame
    * of [[withRank]] stays broadcastable on any timeline span. */
  def adaptiveTimeBucket(df: DataFrame, ts: Column): Column = {
    val r = df.agg(min(unix_micros(ts)), max(unix_micros(ts))).head()
    val spanHours =
      if (r.isNullAt(0)) 0L
      else (r.getLong(1) - r.getLong(0)) / 3600000000L + 1L
    val unit =
      if (spanHours <= MaxBuckets) "hour"
      else if (spanHours <= MaxBuckets * 24L) "day"
      else "month"
    date_trunc(unit, ts)
  }

  /** Adds `out` (1-based per-key rank, long) and `${out}_n` (per-key row
    * count, long) to `df`. `order` must be a total order within each key
    * (include a unique tiebreaker); `bucket` must coarsen its prefix.
    */
  def withRank(df: DataFrame, key: String, bucket: Column, order: Seq[Column],
      out: String = "rk"): DataFrame = {
    // Exchange-diet adjudication (round 10): the bucket-count aggregate
    // and the in-bucket rank window both cluster by (key, __b), so one
    // shared repartition + ReuseExchange looks possible — it is NOT. The
    // two consumers prune to different column sets (counts need only
    // (key, __b); the window keeps every payload column), so Catalyst
    // plans two non-identical scan subtrees and ReuseExchange's
    // canonical-equality test can never match them. Forcing one frame
    // through both would need a cache/checkpoint barrier that costs far
    // more than the count exchange it saves — which is map-side combined
    // and carries only (key, bucket, count) partials, bytes per task.
    // Measured: the repartition form kept the same exchange count and
    // upgraded the tiny count shuffle into a full-row shuffle. Keep this.
    val withB = df.withColumn("__b", bucket)
    val bc = withB.groupBy(col(key), col("__b")).agg(count(lit(1)).as("__nb"))
    val offW = Window.partitionBy(key).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val off = bc.select(col(key), col("__b"),
      coalesce(sum("__nb").over(offW), lit(0L)).as("__off"),
      sum("__nb").over(totW).as(s"${out}_n"))
    val localW = Window.partitionBy(col(key), col("__b")).orderBy(order: _*)
    withB.join(broadcast(off), Seq(key, "__b"))
      .withColumn(out, col("__off") + row_number().over(localW))
      .drop("__b", "__off")
  }

  /** Chunks a [[withRank]]-ranked frame into fixed-size per-key groups so a
    * trailing `win`-row window can run inside bounded partitions: rows land
    * in chunk `g = (rk−1) div chunk`, and each chunk's trailing `win`−1
    * rows are REPLICATED into the following chunk (a map-side explode,
    * ≤ (win−1)/chunk overhead) so every trailing frame is complete within
    * its own (key, g) partition. Adds `g` (long) and `own` (boolean; false
    * on replica rows — window them, then drop them). Downstream windows
    * must partition by (key, g) and order by `rk`; each task then sees at
    * most chunk + win − 1 rows regardless of key cardinality.
    */
  def withTrailingChunks(ranked: DataFrame, win: Int, chunk: Int): DataFrame = {
    require(chunk >= win, s"chunk ($chunk) must be >= win ($win)")
    val g0 = floor((col("rk") - 1) / chunk).cast("long")
    val ownCopy = struct(g0.as("g"), lit(true).as("own"))
    val stripCopy = struct((g0 + 1).as("g"), lit(false).as("own"))
    ranked
      .withColumn("__d",
        explode(when((col("rk") - 1) % chunk >= chunk - (win - 1),
          array(ownCopy, stripCopy)).otherwise(array(ownCopy))))
      .withColumn("g", col("__d.g"))
      .withColumn("own", col("__d.own"))
      .drop("__d")
  }
}
