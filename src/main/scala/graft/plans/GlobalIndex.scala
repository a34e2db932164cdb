package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed dense global row index — the scale-safe replacement for
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY, which funnels
  * every row through a single task (the one non-distributed stage the
  * round-1 plan audit flagged in the flagship pipeline, `j1_zip_join`,
  * and `w3_ntile_rank`).
  *
  * The zipWithIndex pattern, kept declarative:
  *
  *  1. `repartitionByRange(order)` — partitions are globally ordered and
  *     equal keys land in one partition (RangePartitioner is a pure
  *     function of the key).
  *  2. per-partition counts → cumulative offsets. This frame has ONE ROW
  *     PER PARTITION, so the cumulative-sum window over it is
  *     metadata-scale — the same driver-visible state `RDD.zipWithIndex`
  *     collects, minus the eager job.
  *  3. broadcast-join the offsets back; `row_number()` partitioned BY
  *     PARTITION ID plus the offset is the global index.
  *
  * Both branches read the same range exchange (ReuseExchange), so the
  * input is shuffled once for partitioning and once for the window —
  * every stage fully parallel, nothing proportional to the data on any
  * single task.
  *
  * The index is only deterministic if `order` is a total order (callers
  * extend the sort key over every payload column, making residual ties
  * fully identical — thus interchangeable — rows).
  */
object GlobalIndex {

  private val Pid = "__gi_pid"
  private val Cnt = "__gi_cnt"
  private val Off = "__gi_off"

  /** Adds `out` = 0-based dense rank of the row in the total order `order`. */
  def withRowIndex(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    val parted = df.repartitionByRange(order: _*).withColumn(Pid, spark_partition_id())
    val offsets = parted.groupBy(Pid).agg(count(lit(1)).as(Cnt))
      .withColumn(Off,
        coalesce(sum(Cnt).over(Window.orderBy(Pid)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop(Cnt)
    parted.join(broadcast(offsets), Pid)
      .withColumn(out,
        row_number().over(Window.partitionBy(Pid).orderBy(order: _*)).cast("long")
          + col(Off) - 1L)
      .drop(Pid, Off)
  }

  /** Total row count as a 1-row frame, for broadcast into rank arithmetic. */
  def withTotalCount(df: DataFrame, out: String): DataFrame =
    df.crossJoin(broadcast(df.groupBy().agg(count(lit(1)).as(out))))
}
