package graft.plans

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact order statistics over a LONG column the 100 TB way — the
  * bucket-then-refine ladder shared by `a15_quantile_2phase`, `ev_rfm`,
  * `ev_decile_lift`, and `ev_ttc_quantiles`: NO frame in the plan ever
  * scales with the value domain or the row count, and (round-12 guard)
  * no single refine task ever sees more than a bounded slice of the
  * population, whatever the distribution.
  *
  * Phase 1 buckets the values into ≤ ~65538 ADAPTIVE-width integer
  * buckets and aggregates the bucket histogram; the histogram is
  * METADATA-scale (bounded row count) so it is collected and the target
  * ranks are located driver-side — replacing round-11's unpartitioned
  * cumulative window with plain Scala over ≤65538 rows. Phase 2 rescans
  * ONLY the located buckets (broadcast join pruning):
  *
  *  - a located bucket of width 1 holds a single distinct value, so the
  *    answer is `lo + bk` — no scan, no window at all (this is how a
  *    duplicate-heavy mass point terminates: recursion shrinks its
  *    bucket to width 1 and the answer pops out arithmetically);
  *  - a located bucket whose count fits the refine cap (max(65536,
  *    n/1024) by default — 64× the uniform expectation n/65536) gets the
  *    exact k-th order statistic from an in-bucket `row_number` whose
  *    partition is ≤ cap rows BY CONSTRUCTION;
  *  - an OVERSIZED located bucket — the round-11 pathology: nearly all
  *    mass in one bucket plus range-stretching outliers — RECURSES the
  *    ladder into the bucket instead of windowing over it. Each level
  *    divides the surviving span by ≥65536, so depth ≤ 4 covers the full
  *    int64 domain (a defensive depth-6 fallback widens the cap rather
  *    than recurse forever).
  *
  * Overflow discipline (round-11 advisory): width and bucket ids never
  * form `hi - lo` or `x - lo` directly — a span wider than half the
  * int64 range would wrap. Instead `wd = hi div B - lo div B + 1` and
  * `bk = x div wd - lo div wd`, whose terms are all ≤ |int64|/B: exact
  * for ANY long domain, monotone in x (truncating division is monotone),
  * and bounded to ~B+2 distinct buckets.
  */
object QuantileLadder {

  private val B = 65536L
  private val MaxDepth = 6

  private val outSchema = StructType(Seq(
    StructField("k", LongType), StructField("r", LongType),
    StructField("value", LongType)))

  /** `targets`: (k: tag, r: 1-based rank) — METADATA-scale by contract
    * (a handful of quantile ranks; it is collected). `values`: any frame
    * with LONG column `valueCol` (one row per population member,
    * duplicates counted). Returns (k, r, value) — value is the r-th
    * smallest, identical to the definitional sorted-sequence answer
    * whatever the bucketing or recursion path. `refineCap` > 0 overrides
    * the adaptive cap (test hook for exercising the recursion at small n).
    */
  def orderStats(values: DataFrame, valueCol: String,
                 targets: DataFrame, refineCap: Long = 0L): DataFrame = {
    val spark = values.sparkSession
    val tg = targets.select(col("k").cast("long"), col("r").cast("long"))
      .collect().map(r => (0L, r.getLong(0), r.getLong(1))).toSeq
    val v0 = values.select(lit(0L).as("g"), col(valueCol).cast("long").as("x"))
    recurse(v0, tg, depth = 0, refineCap)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema))
  }

  /** One ladder level over group-tagged values. `tgts`: (g, k, r) with r
    * the 1-based rank WITHIN group g. Returns None when nothing survives
    * (empty input or all ranks out of range — the round-11 contract). */
  private def recurse(v: DataFrame, tgts: Seq[(Long, Long, Long)],
                      depth: Int, refineCap: Long): Option[DataFrame] = {
    if (tgts.isEmpty) return None
    val spark = v.sparkSession
    import spark.implicits._

    val mm = v.groupBy("g").agg(min("x").as("lo"), max("x").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    if (mm.isEmpty) return None
    // Overflow-safe adaptive width per group (Scala `/` truncates toward
    // zero exactly like Spark's `div`, so driver and executor agree).
    val meta = mm.map { case (g, (lo, hi)) =>
      val wd = math.max(1L, hi / B - lo / B + 1L)
      (g, wd, lo / wd, lo)
    }.toSeq
    val metaDf = meta.map { case (g, wd, lodiv, _) => (g, wd, lodiv) }
      .toDF("g", "wd", "lodiv")
    val vb = v.join(broadcast(metaDf), "g")
      .withColumn("bk", expr("x div wd - lodiv"))
      .select("g", "bk", "x")

    // The bucket histogram is bounded (≤ ~(B+2) buckets × #groups, and
    // #groups ≤ #targets): collect it and locate ranks driver-side.
    val hist: Map[Long, Seq[(Long, Long)]] =
      vb.groupBy("g", "bk").agg(count(lit(1)).as("cnt")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
        .map { case (g, rs) =>
          g -> rs.map(t => (t._2, t._3)).sortBy(_._1).toSeq }

    val widthOf = meta.map(t => t._1 -> t._2).toMap
    val loOf = meta.map(t => t._1 -> t._4).toMap
    val capOf = hist.map { case (g, bs) =>
      val n = bs.map(_._2).sum
      g -> (if (refineCap > 0) refineCap else math.max(B, n / 1024L))
    }

    val direct = Seq.newBuilder[(Long, Long, Long)]  // (k, r, value)
    val refine = Seq.newBuilder[(Long, Long, Long, Long, Long)] // g,bk,k,r,rn
    val big = scala.collection.mutable.LinkedHashMap
      .empty[(Long, Long), Long] // (g, bk) -> new group id
    val subTgts = Seq.newBuilder[(Long, Long, Long)]
    var nextG = 0L

    for ((g, k, r) <- tgts; buckets <- hist.get(g)) {
      var cum = 0L
      val it = buckets.iterator
      var located: Option[(Long, Long, Long)] = None // (bk, below, cnt)
      while (located.isEmpty && it.hasNext) {
        val (bk, cnt) = it.next()
        if (cum + cnt >= r) located = Some((bk, cum, cnt))
        cum += cnt
      }
      located.foreach { case (bk, below, cnt) =>
        if (widthOf(g) == 1L) direct += ((k, r, loOf(g) + bk))
        else if (cnt <= capOf(g) || depth >= MaxDepth)
          refine += ((g, bk, k, r, r - below))
        else {
          val gNew = big.getOrElseUpdate((g, bk), { nextG += 1; nextG - 1 })
          subTgts += ((gNew, k, r - below))
        }
      }
    }

    val parts = Seq.newBuilder[DataFrame]
    val d = direct.result()
    if (d.nonEmpty) parts += d.toDF("k", "r", "value")
    val rf = refine.result()
    if (rf.nonEmpty) {
      val rfDf = rf.toDF("g", "bk", "k", "r", "rn_t")
      parts += vb.join(broadcast(rfDf), Seq("g", "bk"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("g", "bk", "k").orderBy("x")))
        .where(col("rn") === col("rn_t"))
        .select(col("k"), col("r"), col("x").as("value"))
    }
    val bg = big.toSeq
    if (bg.nonEmpty) {
      val bgDf = bg.map { case ((g, bk), gn) => (g, bk, gn) }
        .toDF("g", "bk", "gn")
      val subV = vb.join(broadcast(bgDf), Seq("g", "bk"))
        .select(col("gn").as("g"), col("x"))
      recurse(subV, subTgts.result(), depth + 1, refineCap)
        .foreach(parts += _)
    }
    parts.result().reduceOption(_.unionAll(_))
  }
}
