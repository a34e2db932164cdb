package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics over a LONG column the 100 TB way — the
  * bucket-then-refine ladder shared by `a15_quantile_2phase`, `ev_rfm`,
  * and `ev_decile_lift` (extracted round 11 after the ev_rfm de-trap):
  * NO frame in the plan ever scales with the value domain or the row
  * count.
  *
  * Phase 1 buckets the values into ≤ 65537 ADAPTIVE-width integer
  * buckets (width from a one-row min/max broadcast — the KeyedRank span
  * discipline), a cumulative count over the bounded bucket histogram
  * locates the bucket holding each target rank, and phase 2 rescans ONLY
  * the located buckets (broadcast join pruning) to extract the exact
  * k-th order statistic with an in-bucket row_number. The unpartitioned
  * cumulative window rides the ≤65537-row bucket frame (grouping key
  * `bk` — allowlisted in ScaleDesignSpec's unbounded-domain sweep); the
  * refine window partitions by (k, bk).
  */
object QuantileLadder {

  /** `targets`: (k: tag, r: 1-based rank). `values`: any frame with LONG
    * column `valueCol` (one row per population member, duplicates
    * counted). Returns (k, r, value) — value is the r-th smallest,
    * bit-identical to the definitional min-v-with-cum≥r histogram form
    * whatever the bucketing. */
  def orderStats(values: DataFrame, valueCol: String,
                 targets: DataFrame): DataFrame = {
    val v = values.select(col(valueCol).as("x"))
    val mm = v.groupBy().agg(min("x").as("lo"), max("x").as("hi"))
    val withB = v.crossJoin(broadcast(mm))
      .withColumn("bk",
        expr("(x - lo) div greatest(1, (hi - lo) div 65536 + 1)"))
    val cum = withB.groupBy("bk").agg(count(lit(1)).as("cnt"))
      .withColumn("cumhi", sum("cnt").over(
        Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, 0)))
    val located = cum.join(broadcast(targets), col("cumhi") >= col("r"))
      .groupBy("k", "r")
      .agg(min(struct(col("bk"), col("cumhi"), col("cnt"))).as("t"))
      .select(col("k"), col("r"), col("t.bk").as("bk"),
        (col("t.cumhi") - col("t.cnt")).as("below"))
    withB.join(broadcast(located), "bk")
      .withColumn("rn", row_number().over(
        Window.partitionBy("k", "bk").orderBy("x")))
      .where(col("rn") === col("r") - col("below"))
      .select(col("k"), col("r"), col("x").as("value"))
  }
}
