package graft.operators

import graft.Exact.dsum
import graft.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time window semantics (SURVEY.md §2.10 T5 extensions) as batch
  * queries — the same operators run under `readStream` + watermark in
  * [[graft.streaming.QueuePipeline]]; batch mode makes them oracle-checkable.
  *
  * Oracle equivalences worth noting:
  *  - `session_window(ts, gap)`: a new session starts when the inter-event
  *    gap is ≥ gap (Spark's window is [start, last+gap), an event landing
  *    exactly at the boundary opens a NEW session). The SQL mirror is the
  *    gaps-and-islands construction with `>=`.
  *  - sliding `window(ts, width, slide)`: every event belongs to
  *    width/slide windows; the SQL mirror cross-joins each event with its
  *    window-start offsets computed from epoch-µs floor division.
  */
object EventWindows {

  type Q = (SparkSession, String) => DataFrame

  private[graft] val GapUs = 1800L * 1000000L // 30 minutes

  // ev_anomaly: trailing window length (rows), warm-up floor, z threshold,
  // and the per-(type, chunk) partition size for the bounded-window form.
  private val AnomWin = 100
  private val AnomMinN = 30
  private val AnomZ = 3.0
  private val AnomChunk = 1000 // must be >= AnomWin; ~10% strip duplication

  // ev_ewma: trailing exponentially-weighted mean with decay ratio 1/2 over
  // the last EwmaWin rows per type. Powers of 2 keep the weighted sum an
  // exact integer: Σ c_j·2^(n−1−j) ≤ cents_max·2^50 ≈ 3×10²² — inside
  // decimal(38,0)/HUGEINT on both engines (the events cents domain is
  // pinned in TestdataContractSpec).
  private[graft] val EwmaWin = 50 // shared with streaming.StatefulOps.EwmaProcessor
  private val AcfMaxLag = 7 // ev_acf: autocorrelation lags 1..7 (one week)
  private val EwmaChunk = 1000

  /** ev_hurst: R/S block sizes. The driver's event spine is 30 calendar
    * days at every SF (ReplicateSf shifts ids, never timestamps), so the
    * three sizes yield 6/3/2 complete blocks — enough points for the
    * log-log slope while every block holds ≥ 5 days. */
  private val HurstWins = Seq(5, 10, 15)

  /** ev_hurst: the log-log regression abscissas are CONSTANTS (ln w for
    * the fixed block sizes), so the slope is a fixed linear combination
    * Σ a_w·ln(R/S)_w with a_w = (ln w − mean)/Σ(ln w − mean)² computed
    * ONCE here on the JVM and interpolated verbatim into the oracle SQL
    * — both engines then evaluate the identical double literals (the
    * MarkovIters / AcfMaxLag interpolation discipline). */
  private val HurstCoef: Map[Int, Double] = {
    val xs = HurstWins.map(w => math.log(w.toDouble))
    val xbar = xs.sum / xs.length
    val den = xs.map(x => (x - xbar) * (x - xbar)).sum
    HurstWins.zip(xs.map(x => (x - xbar) / den)).toMap
  }

  /** ev_markov: fixed unrolled power-iteration depth. At the corpus
    * eigengap the chain mixes within a handful of steps; the depth is
    * FIXED (not run-to-convergence) so the DuckDB oracle is the identical
    * computation. */
  private val MarkovIters = 24

  /** ev_path: how many top 3-step session paths to keep. */
  private val PathTopN = 20

  /** ev_kaplan_meier: users last seen within this many days of the
    * corpus horizon are right-censored (still alive), not churned. */
  private val KmCensorDays = 7L

  val queries: Map[String, Q] = Map(
    // Rolling z-score anomaly flags per event type: each event scored
    // against the trailing AnomWin-row window (inclusive of itself) on its
    // type's timeline; |z| >= AnomZ rows surface. Exactness: values become
    // integer cents (floor(x·100+0.5), the house rounding), the window
    // keeps integer power sums (count/sum/sum-of-squares — exact on any
    // partitioning), and z = (c·n − cs)/√(n·css − cs²) is division-free
    // until one sqrt + one divide over identical integers — bit-identical
    // cross-engine before the round(6) guard. Integer bounds (the int64
    // envelope, derived from the TestdataContractSpec pin |value| < 1e5,
    // i.e. |c| < 1e7 cents): c² < 1e14, css ≤ AnomWin·c² = 1e16,
    // n·css ≤ 1e18, |cs| ≤ AnomWin·c = 1e9 so cs² ≤ 1e18 — every term
    // sits ≥ 9× inside int64's 9.2e18, so Spark accumulates css and the
    // discriminant in plain longs (the round-10 DECIMAL(38,0) form cost
    // ~1.9× for overflow headroom the pinned domain already rules out).
    // The DuckDB oracle still sums css/disc in HUGEINT: if the envelope
    // ever broke, Spark would wrap where DuckDB stays exact and the hash
    // gate fails LOUDLY — the divergence guard is the contract pin plus
    // the cross-engine mismatch, never a silent agreement-in-error.
    // c·n − cs itself needs |c| ≤ 1e16 to wrap, far past the domain.
    //
    // Scale shape: event_type has a handful of values, so a plain
    // per-type window would funnel each type's whole timeline through one
    // task. Instead: (1) KeyedRank assigns the global per-type rank from
    // span-adaptive time buckets (hour here) + a metadata-scale offset
    // table; (2) rows chunk by
    // rank div AnomChunk and the trailing AnomWin−1 rows of each chunk
    // are REPLICATED into the next chunk (map-side explode, ~10% overhead)
    // so every trailing window is complete inside its own (type, chunk)
    // partition; (3) the rolling sums run per (type, chunk) — bounded at
    // AnomChunk+AnomWin−1 rows per task — and replica rows are dropped
    // after contributing. Identical n/cs/css per surviving row, so the
    // DuckDB single-window oracle still hash-matches.
    "ev_anomaly" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("ts"), col("value"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      val ranked = graft.plans.KeyedRank.withRank(ev, "event_type",
        graft.plans.KeyedRank.adaptiveTimeBucket(ev, col("ts")),
        Seq(col("ts"), col("event_id")))
      val dup = graft.plans.KeyedRank.withTrailingChunks(ranked, AnomWin, AnomChunk)
      val w = Window.partitionBy("event_type", "g").orderBy("rk")
        .rowsBetween(-(AnomWin - 1), 0)
      val stats = dup
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("cs", sum(col("c")).over(w))
        .withColumn("css", sum(col("c") * col("c")).over(w))
      val disc = col("n") * col("css") - col("cs") * col("cs")
      val zRaw = (col("c") * col("n") - col("cs")).cast("double") /
        sqrt(disc.cast("double"))
      stats
        .where(col("own") && col("n") >= AnomMinN && disc > 0 &&
          abs(zRaw) >= AnomZ)
        .select(col("event_id"), col("event_type"), col("value"),
          round(zRaw, 6).as("z"))
        .orderBy("event_id")
    }),
    // Trailing EWMA (decay 1/2, last EwmaWin rows) per event type — the
    // smoothing primitive under monitoring dashboards and drift detectors.
    // Exactness: geometric weights 2^(n−1−j) make the weighted sum an
    // integer, computed as a Horner fold over the reversed trailing-frame
    // list (acc·2 + c — newest element ends up with the highest weight) in
    // decimal(38,0) (DuckDB: HUGEINT); the divisor 2^n − 1 is the weight
    // total, so the result is a true weighted mean with the same warm-up
    // semantics on both engines. Only the final quotient is double
    // (identical correctly-rounded casts of identical integers), round(6)
    // guard. Scale shape: the ev_anomaly template — KeyedRank global
    // per-type ranks from span-adaptive time buckets, the trailing frame in
    // (type, chunk) partitions with a replicated EwmaWin−1 boundary strip,
    // so no task ever holds more than EwmaChunk+EwmaWin−1 rows however few
    // event types exist.
    "ev_ewma" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("ts"), col("value"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      val ranked = graft.plans.KeyedRank.withRank(ev, "event_type",
        graft.plans.KeyedRank.adaptiveTimeBucket(ev, col("ts")),
        Seq(col("ts"), col("event_id")))
      val dup = graft.plans.KeyedRank.withTrailingChunks(ranked, EwmaWin, EwmaChunk)
      val w = Window.partitionBy("event_type", "g").orderBy("rk")
        .rowsBetween(-(EwmaWin - 1), 0)
      val lst = collect_list(col("c")).over(w)
      val horner = aggregate(reverse(lst), lit(0L).cast("decimal(38,0)"),
        (acc, x) => (acc * lit(2) + x).cast("decimal(38,0)"))
      val denom = aggregate(lst, lit(0L), (acc, _) => acc * 2 + 1) // 2^n − 1
      dup
        .withColumn("ewma",
          round(horner.cast("double") / denom.cast("double") / 100.0, 6))
        .where(col("own"))
        .select(col("event_id"), col("event_type"), col("value"), col("ewma"))
        .orderBy("event_id")
    }),

    // Per-type running total over event time — the cumulative-sum window
    // shape WITHOUT a per-type window partition: decimal partial sums per
    // (type, adaptive time bucket) roll up into a metadata-scale offset table
    // (exact: decimal addition is associative, so bucket offset + local
    // prefix = the global prefix bit-for-bit), and the in-bucket prefix
    // runs in a bounded (type, bucket) window. The same ladder
    // generalizes to ANY associative running aggregate; ev_anomaly's
    // chunked strip form exists only because its windowed stats are a
    // fixed-width trailing frame, not a prefix.
    "ev_cumsum" -> ((s, dir) => {
      val ev0 = load(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("ts"), col("value"))
      val ev = ev0.withColumn("b",
        graft.plans.KeyedRank.adaptiveTimeBucket(ev0, col("ts")))
      val bt = ev.groupBy("event_type", "b")
        .agg(sum(graft.Exact.dec(col("value"))).as("sb"))
      val offW = Window.partitionBy("event_type").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = bt.select(col("event_type"), col("b"),
        coalesce(sum(col("sb")).over(offW), lit(0).cast("decimal(38,2)")).as("off"))
      val localW = Window.partitionBy("event_type", "b")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      ev.join(broadcast(off), Seq("event_type", "b"))
        .withColumn("running_sum",
          (col("off") + sum(graft.Exact.dec(col("value"))).over(localW))
            .cast("double"))
        .select(col("event_id"), col("event_type"), col("value"), col("running_sum"))
        .orderBy("event_id")
    }),

    // Hour-of-day seasonality per event type: peak hour, peak share, and
    // an EXACT χ² uniformity statistic — "is this type's traffic flat or
    // rush-hour shaped" (the monitoring gate before capacity planning or
    // sampling by time-of-day). Algebra keeps χ² integer to the last
    // division: Σ(O−n/24)²/(n/24) = (24·ΣO² − n²)/n, with ΣO² and n² in
    // decimal(38,0)/HUGEINT (absent hours contribute 0² = 0, so summing
    // present rows IS the 24-hour sum). One corpus-scale (type, hour)
    // aggregate; the peak argmax window rides the ≤ types×24 frame.
    //
    // Streaming-twin adjudication (round-14): no custom twin needed —
    // the whole op is one ASSOCIATIVE aggregate ((type, hour) counts)
    // plus types-scale scalar algebra. Structured Streaming's built-in
    // groupBy().count() in update/complete mode maintains those counts
    // incrementally with no custom carried state; there is no
    // sequential recursion to twin (the defining property of the
    // Holt/Croston/Page–Hinkley family the twin sweep covers).
    "ev_seasonality" -> ((s, dir) => {
      val g = load(s, dir, "events")
        .select(col("event_type"), hour(col("ts")).as("h"))
        .groupBy("event_type", "h").agg(count(lit(1)).as("o"))
      val wPeak = Window.partitionBy("event_type")
        .orderBy(col("o").desc, col("h"))
      g.withColumn("rn", row_number().over(wPeak))
        .groupBy("event_type")
        .agg(sum(col("o")).as("n"),
          sum(col("o").cast("decimal(38,0)") * col("o")).as("so2"),
          max(when(col("rn") === 1, col("h"))).as("peak_hour"),
          max(when(col("rn") === 1, col("o"))).as("peak_o"))
        .select(col("event_type"), col("n"), col("peak_hour"),
          round(col("peak_o").cast("double") / col("n"), 6).as("peak_share"),
          round((lit(24) * col("so2").cast("double") -
              col("n").cast("double") * col("n").cast("double")) / col("n"), 6)
            .as("chi2_uniform"))
        .orderBy("event_type")
    }),

    // Stationary distribution of the event-type Markov chain — "where
    // does user behavior settle": row-normalize the ev_transitions count
    // matrix and power-iterate π ← πP from uniform. Scale shape: the
    // emb_pca_power discipline — the ONLY data-scale work is the per-user
    // lag window (user_id-keyed) + one (from, to) count aggregate; the
    // types² matrix is model-scale, collected, and iterated on the driver
    // with every float sum folded in from-state order, mirrored by
    // MarkovIters unrolled DuckDB CTE layers over the same join order —
    // identical doubles by construction, round(6) guard. States never
    // transitioned INTO drop out after step 1 on both sides (join
    // semantics), which is also the right answer: they have stationary
    // mass 0.
    //
    // Streaming-twin adjudication (round-14): the carried computation
    // here is the power iteration over the MODEL-SCALE types² matrix on
    // the driver, not a per-key fold over the stream — the only
    // data-scale state is the (from, to) transition-count aggregate,
    // which Structured Streaming's built-in keyed count maintains
    // incrementally (plus the per-user previous-type lag, already the
    // shape of SessionPathProcessor's carried state). A "twin" would be
    // that built-in count feed with the identical driver solve run per
    // trigger — nothing bespoke to carry, so the batch form stays the
    // only consumer of the solve.
    "ev_markov" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val types = load(s, dir, "events")
        .select(col("event_type")).distinct().collect()
        .map(_.getString(0)).sorted
      val trans = load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .where(col("prev_type").isNotNull)
        .groupBy(col("prev_type").as("f"), col("event_type").as("t"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val rowSum = trans.groupBy(_._1).map { case (f, ps) => f -> ps.map(_._3).sum }
      val p = trans.map { case (f, t, c) => (f, t, c.toDouble / rowSum(f)) }
      // pairs grouped by destination, each group sorted by from-state —
      // the exact list the SQL's list(term ORDER BY f) folds.
      val byTo = p.groupBy(_._2).view.mapValues(_.sortBy(_._1)).toMap
      var pi: Map[String, Double] = types.map(_ -> 1.0 / types.length).toMap
      for (_ <- 1 to MarkovIters)
        pi = byTo.collect { case (t, ins) =>
          val terms = ins.flatMap { case (f, _, pr) => pi.get(f).map(_ * pr) }
          t -> terms.foldLeft(0.0)(_ + _)
        }.toMap
      pi.toSeq.map { case (t, v) =>
        (t, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toDF("event_type", "pi").orderBy("event_type")
    }),

    // Native session windows per user: count + bounds per session.
    "t6_session_window" -> ((s, dir) =>
      load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"), col("w.start").as("sess_start"),
          col("w.end").as("sess_end"), col("n_events"), col("sum_value"))
        .orderBy("user_id", "sess_start")),

    // Sliding 1h windows every 30min per event type.
    "t7_sliding_window" -> ((s, dir) =>
      load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n"))
        .orderBy("win_start", "event_type")),

    // Ordered conversion funnel signup → click → purchase: a user reaches
    // step k only via an event strictly after their step-(k−1) time. Each
    // stage is filter → groupBy(user) → min(ts), then an equi-join on
    // user_id with the previous stage. At 100 TB the event_type filters cut
    // the scan long before the first shuffle, every shuffle is keyed on
    // user_id (AQE-coalesced), and the per-stage frames shrink
    // monotonically — no window over the raw event stream is ever needed.
    "ev_funnel" -> ((s, dir) => {
      val ev = load(s, dir, "events")
      def stage(prev: DataFrame, step: String, tPrev: String, tOut: String) =
        ev.where(col("event_type") === step)
          .join(prev, "user_id")
          .where(col("ts") > col(tPrev))
          .groupBy("user_id").agg(min(col("ts")).as(tOut))
      val s1 = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val s2 = stage(s1, "click", "t1", "t2")
      val s3 = stage(s2, "purchase", "t2", "t3")
      def row(df: DataFrame, step: Int, name: String) =
        df.agg(count(lit(1)).as("users"))
          .select(lit(step).cast("long").as("step"), lit(name).as("event_type"),
            col("users"))
      row(s1, 1, "signup").unionAll(row(s2, 2, "click"))
        .unionAll(row(s3, 3, "purchase")).orderBy("step")
    }),

    // 7-day rolling distinct active users (WAU) per observed day. Rolling
    // COUNT(DISTINCT) has no window form on either engine, and a day-range
    // join would plan as a nested loop — instead each event fans out to
    // the ≤7 future days it keeps its user "active" for (a fixed ×7
    // map-side explode; the partial hash agg dedups (user, day) pairs
    // before anything hits the wire), carrying a direct-hit flag so the
    // per-day agg can both count distinct users AND drop the phantom days
    // no event actually landed on — no second distinct, no day-list
    // broadcast join, no count_distinct Expand. At 100 TB: one keyed
    // shuffle of ≤7× the distinct (user, day) pairs, one day-scale agg,
    // one sort — down from 5 exchanges in the join formulation.
    "ev_rolling_wau" -> ((s, dir) =>
      load(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"),
          explode(sequence(lit(0), lit(6))).as("k"))
        .select(col("user_id"), date_add(col("day"), col("k")).as("d"),
          (col("k") === 0).cast("int").as("direct"))
        .groupBy("user_id", "d").agg(max(col("direct")).as("direct"))
        .groupBy("d").agg(count(lit(1)).as("wau"), max(col("direct")).as("hit"))
        .where(col("hit") === 1)
        .select(col("d"), col("wau"))
        .orderBy("d")),

    // DAU/MAU stickiness per observed day — the engagement ratio product
    // analytics watches daily. Same shape as ev_rolling_wau with the
    // 28-day trailing window: each distinct (user, day) pair fans out to
    // the ≤28 future days it keeps the user "monthly active" for, the
    // direct-day flag yields DAU from the SAME aggregate that counts MAU
    // (and drops phantom days), so one keyed shuffle of ≤28× the distinct
    // pairs + one day-scale agg covers both numerator and denominator —
    // no second distinct, no day-range join.
    "ev_stickiness" -> ((s, dir) =>
      load(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"),
          explode(sequence(lit(0), lit(27))).as("k"))
        .select(col("user_id"), date_add(col("day"), col("k")).as("d"),
          (col("k") === 0).cast("int").as("direct"))
        .groupBy("user_id", "d").agg(max(col("direct")).as("direct"))
        .groupBy("d").agg(sum(col("direct")).as("dau"),
          count(lit(1)).as("mau"), max(col("direct")).as("hit"))
        .where(col("hit") === 1)
        .select(col("d"), col("dau"), col("mau"),
          round(col("dau").cast("double") / col("mau"), 6).as("stickiness"))
        .orderBy("d")),

    // Daily retention triangle (the product-analytics D0–D7 matrix):
    // cohort = a user's first-seen day; `users` = cohort members active
    // exactly k days later (k ≤ 7); `retention` = users / cohort size
    // (the k=0 row is the denominator — first day is always active).
    // Same one-agg shape as ev_cohort: min(day) and the distinct day set
    // come out of ONE user-keyed aggregate, the set explode yields one
    // row per (user, day), and the cohort join is a broadcast of the
    // day-scale k=0 frame. collect_set is bounded by the corpus day span
    // (a decade ≈ 3.7k entries); for multi-year deployments swap in the
    // two-pass min-day + co-partitioned join form — same downstream.
    // Weekly growth accounting — the active-user decomposition every
    // growth team reports: each week's actives split into new (first
    // week ever), retained (active the prior week), resurrected
    // (returned after a gap), plus churned = prior WAU − retained. All
    // integer week indexes (epoch-day div 7 — engine-exact; weekly
    // granularity so the one-month corpus exercises every class); one
    // (user, week) dedup, a user-keyed lag for classification, one
    // week-scale rollup, and the churn lag rides the weeks frame above
    // the aggregate.
    "ev_growth_acct" -> ((s, dir) => {
      val um = load(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000 div 7").as("m"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("m")
      val cls = um.withColumn("prev", lag("m", 1).over(w))
        .withColumn("new_", (col("prev").isNull).cast("long"))
        .withColumn("ret", (col("prev") === col("m") - 1).cast("long"))
      val byMonth = cls.groupBy("m")
        .agg(count(lit(1)).as("mau"),
          sum("new_").as("new_users"),
          sum(coalesce(col("ret"), lit(0L))).as("retained"))
        .withColumn("resurrected",
          col("mau") - col("new_users") - col("retained"))
      val wM = Window.orderBy("m")
      byMonth
        .withColumn("churned",
          coalesce(lag("mau", 1).over(wM), lit(0L)) - col("retained"))
        .select(
          timestamp_micros(col("m") * 7L * 86400000000L).cast("date")
            .as("week_start"),
          col("mau").as("wau"), col("new_users"), col("retained"),
          col("resurrected"), col("churned"))
        .orderBy("week_start")
    }),

    // Longest consecutive-day activity streak per user (the gamification
    // /habit metric): gaps-and-islands over each user's DISTINCT active
    // days — day − rank is constant within a run of consecutive days, so
    // one user-keyed dedup, one rank window, and one two-level rollup
    // yield current streak length, longest streak, and its start day.
    // All integer day arithmetic; user_id is a data-scale key.
    "ev_streaks" -> ((s, dir) => {
      val days = load(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("d"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("d")
      val runs = days
        .withColumn("grp", col("d") - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"), min("d").as("start_d"), max("d").as("end_d"))
      val best = Window.partitionBy("user_id")
        .orderBy(col("len").desc, col("start_d"))
      runs
        .withColumn("rn", row_number().over(best))
        .withColumn("last_d", max("end_d").over(Window.partitionBy("user_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .where(col("rn") === 1)
        .select(col("user_id"), col("len").as("longest_streak"),
          timestamp_micros(col("start_d") * 86400000000L).cast("date")
            .as("streak_start"),
          timestamp_micros(col("last_d") * 86400000000L).cast("date")
            .as("last_active_day"))
        .orderBy("user_id")
    }),

    // Inter-arrival-time distribution per event type (the burstiness /
    // rate-stability readout behind capacity planning and anomaly
    // baselines): gap to the previous same-type event, log2-bucketed
    // (bucket = floor(log2(gap_seconds)); safe cross-engine: log2 of a
    // power of two is IEEE-exact and of any other integer is ≥ 7e-10
    // from the floor boundary at this domain), counted per (type,
    // bucket) with each bucket's exact
    // integer mean gap. The per-type lag is the KeyedRank chunked form at
    // win=2: event_type is low-cardinality, so a plain per-type lag
    // window is the single-task trap — the global rank comes from
    // span-adaptive buckets and the 1-row boundary strip makes every
    // chunk's first gap computable inside its own (type, chunk)
    // partition. All integers end to end.
    "ev_interarrival" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("event_type"), col("ts"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val ranked = graft.plans.KeyedRank.withRank(ev, "event_type",
        graft.plans.KeyedRank.adaptiveTimeBucket(ev, col("ts")),
        Seq(col("ts"), col("event_id")))
      val dup = graft.plans.KeyedRank.withTrailingChunks(ranked, 2, 1000)
      val w = Window.partitionBy("event_type", "g").orderBy("rk")
      val gaps = dup
        .withColumn("pus", lag("us", 1).over(w))
        .where(col("own") && col("pus").isNotNull)
        .withColumn("gap_s", expr("(us - pus) div 1000000"))
      // floor(log2(g)) for g >= 1 computed as INTEGER bit length − 1
      // (length of the minimal binary rendering: Spark conv(g,10,2),
      // DuckDB bin(g) — both verified minimal for positive BIGINT), not
      // ln(g)/ln(2): a float log is a platform libm identity at exact
      // power-of-two boundaries, while the bit length is the a-series
      // integer discipline. g = 0 (same-second events) gets bucket −1.
      val bucket = when(col("gap_s") <= 0, lit(-1L))
        .otherwise((length(conv(col("gap_s"), 10, 2)) - 1).cast("long"))
      gaps.select(col("event_type"), bucket.as("log2_bucket"), col("gap_s"))
        .groupBy("event_type", "log2_bucket")
        .agg(count(lit(1)).as("n"),
          round(sum(col("gap_s")).cast("double") / count(lit(1)), 6)
            .as("mean_gap_s"))
        .orderBy("event_type", "log2_bucket")
    }),

    // Lag-1 autocorrelation of the per-type daily totals — the "is
    // yesterday predictive of today" number behind every forecasting
    // go/no-go, computed as Pearson r over consecutive-day pairs on the
    // COMPLETE calendar spine (absent days are true zeros — the
    // ev_forecast_sn calendar lesson). Exactness: daily totals are
    // integer cents, the six pair sums accumulate decimal(38,0)/HUGEINT,
    // and r is one identical num/√·/√· double expression, round(6);
    // zero-variance series yield NULL on both engines (nullif-style
    // guard), never a NaN-ordering hazard. Scale: one corpus (type, day)
    // agg; spine, lag, and sums ride the types×days metadata frame.
    "ev_autocorr" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
        .localCheckpoint()
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val w = Window.partitionBy("event_type").orderBy("d")
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc"))
        .withColumn("px", lag("sc", 1).over(w))
        .where(col("px").isNotNull)
      val g = f.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(dec(col("px"))).as("sx"), sum(dec(col("sc"))).as("sy"),
        sum(dec(col("px")) * col("px")).as("sxx"),
        sum(dec(col("sc")) * col("sc")).as("syy"),
        sum(dec(col("px")) * col("sc")).as("sxy"))
      val dx = g("n") * col("sxx") - col("sx") * col("sx")
      val dy = g("n") * col("syy") - col("sy") * col("sy")
      g.select(col("event_type"), col("n").as("n_pairs"),
          round(when(dx > 0 && dy > 0,
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt(dx.cast("double")) / sqrt(dy.cast("double"))), 6)
            .as("r_lag1"))
        .orderBy("event_type")
    }),

    // Full autocorrelation function at lags 1..AcfMaxLag per type — the
    // multi-lag generalization of ev_autocorr (the shape analysts read
    // as a correlogram: weekly seasonality shows as a lag-7 spike).
    // Formulation: instead of AcfMaxLag window passes, the zero-filled
    // daily spine self-joins ONCE on (type, day − k) against a broadcast
    // 7-row lag table — the spine is integer-day keyed so the lag join
    // is an exact equi-join, and every frame in sight is types×days
    // metadata scale. Per (type, lag) the Pearson r rides the identical
    // division-free decimal sums as ev_autocorr (one double per output
    // row, round(6), degenerate-variance NULL guard).
    "ev_acf" -> ((s, dir) => {
      import s.implicits._
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc"))
        .select(col("event_type"),
          datediff(col("d"), lit("1970-01-01").cast("date")).as("dd"),
          col("sc"))
        .localCheckpoint() // scanned twice: the y side and the lagged x side
      val lags = (1 to AcfMaxLag).toDF("k")
      val prev = f.select(col("event_type").as("pt"), col("dd").as("pd"),
        col("sc").as("x"))
      val g = f.select(col("event_type"), col("dd"), col("sc").as("y"))
        .crossJoin(broadcast(lags))
        .join(prev, col("event_type") === col("pt") &&
          col("pd") === col("dd") - col("k"))
        .groupBy("event_type", "k")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
          sum(dec(col("x")) * col("x")).as("sxx"),
          sum(dec(col("y")) * col("y")).as("syy"),
          sum(dec(col("x")) * col("y")).as("sxy"))
      val dx = col("n") * col("sxx") - col("sx") * col("sx")
      val dy = col("n") * col("syy") - col("sy") * col("sy")
      g.select(col("event_type"), col("k").as("lag"), col("n").as("n_pairs"),
          round(when(dx > 0 && dy > 0,
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt(dx.cast("double")) / sqrt(dy.cast("double"))), 6)
            .as("r"))
        .orderBy("event_type", "lag")
    }),

    // Poisson dispersion (variance-to-mean) of the per-type daily event
    // counts — the first question a capacity planner asks of an arrival
    // process: D ≈ 1 is Poisson, D ≫ 1 is bursty/overdispersed (and
    // the per-type rate models downstream are invalid). Division-free
    // until the last step: with S = Σc, Q = Σc² over the zero-filled
    // n-day spine (all decimal(38,0)/HUGEINT), the sample
    // variance-to-mean is D = (n·Q − S²)/((n−1)·S) and the classic
    // dispersion test statistic is χ² = (n−1)·D = (n·Q − S²)/S — two
    // exact integer ratios, one double division each, round(6); NULL
    // when S = 0 or n < 2. Scale: ONE corpus (type, day) count agg;
    // everything else rides the types×days frame.
    "ev_poisson_disp" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"))
        .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("c"))
      f.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(col("c")).as("n_events"),
          sum(col("c").cast("decimal(38,0)") * col("c")).as("q"))
        .select(col("event_type"), col("n_days"), col("n_events"),
          round(col("n_events").cast("double") / col("n_days"), 6)
            .as("mean_per_day"),
          round(when(col("n_events") > 0 && col("n_days") > 1,
            (col("n_days").cast("decimal(38,0)") * col("q") -
              col("n_events").cast("decimal(38,0)") * col("n_events"))
              .cast("double") /
              ((col("n_days") - 1).cast("double") *
                col("n_events").cast("double"))), 6).as("dispersion"),
          round(when(col("n_events") > 0,
            (col("n_days").cast("decimal(38,0)") * col("q") -
              col("n_events").cast("decimal(38,0)") * col("n_events"))
              .cast("double") / col("n_events").cast("double")), 6)
            .as("chi2_disp"))
        .orderBy("event_type")
    }),

    // Weekend-vs-weekday odds ratio of high-value events per type — the
    // 2×2 association measure (with its Katz log-normal 95% CI) behind
    // "does this event type monetize differently on weekends", and the
    // epidemiology-standard contingency summary ev_ab_test's z-test
    // does not give. Cells are exact integer counts from ONE keyed agg
    // (a = high∧weekend, b = high∧weekday, c = low∧weekend,
    // d = low∧weekday); OR = (a·d)/(b·c) with the integer products
    // formed first (exact in int64 at any realistic count), then one
    // double division; se(ln OR) = √(1/a+1/b+1/c+1/d) left-folded in
    // the same IEEE order on both engines; CI = exp(ln OR ± 1.96·se).
    // NULL when any cell is empty (the standard undefined-OR case).
    // Weekday split: Spark weekday() ∈ {5,6} ≡ DuckDB isodow ∈ {6,7}.
    "ev_odds_ratio" -> ((s, dir) => {
      val g = load(s, dir, "events")
        .select(col("event_type"),
          (weekday(to_date(col("ts"))) >= 5).cast("long").as("we"),
          (col("value") > 99.5).cast("long").as("hi"))
        .groupBy("event_type")
        .agg(sum(col("we") * col("hi")).as("a"),
          sum((lit(1) - col("we")) * col("hi")).as("b"),
          sum(col("we") * (lit(1) - col("hi"))).as("c"),
          sum((lit(1) - col("we")) * (lit(1) - col("hi"))).as("d"))
      val or = (col("a") * col("d")).cast("double") /
        (col("b") * col("c")).cast("double")
      val se = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
        lit(1.0) / col("c") + lit(1.0) / col("d"))
      val ok = col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0
      g.select(col("event_type"), col("a"), col("b"), col("c"), col("d"),
          round(when(ok, or), 6).as("odds_ratio"),
          round(when(ok, exp(log(or) - lit(1.96) * se)), 6).as("ci_lo"),
          round(when(ok, exp(log(or) + lit(1.96) * se)), 6).as("ci_hi"))
        .orderBy("event_type")
    }),

    // Rescaled-range (R/S) Hurst exponent per event type (Hurst 1951,
    // Mandelbrot & Wallis 1969) — the long-memory diagnostic behind
    // "does this metric trend or mean-revert": H ≈ 0.5 is a random walk,
    // H > 0.5 persistent, H < 0.5 anti-persistent. Per block size
    // w ∈ HurstWins the zero-filled daily series splits into ⌊n/w⌋
    // COMPLETE blocks; within a block the cumulative deviations stay
    // integer by scaling with w: w·Y_j = w·P_j − (j+1)·S (P = prefix sum,
    // S = block total, all decimal(38,0)/HUGEINT), and
    // R/S = (max w·Y − min w·Y)/√(w·Q − S²) — the w and the 1/w of the
    // population σ cancel, so the ONLY doubles are one sqrt-divide per
    // block. Block means fold in block order, the final slope is the
    // fixed linear combination Σ a_w·ln(R/S̄_w) (HurstCoef — constants
    // interpolated into the oracle). NULL when any size lacks a valid
    // block (degenerate variance blocks are excluded identically on both
    // engines). Scale: every frame after the one corpus (type, day) agg
    // is types×days metadata; the per-block windows partition by
    // (type, w, block) over ≤ 3n rows per type.
    //
    // Streaming-twin adjudication: retrospective by construction (the
    // ev_cusum_cp class) — every block's R/S uses the block's FULL
    // prefix-sum extrema and the slope needs every block closed, so no
    // causal processor can emit before the series does; the batch form
    // is the only consumer.
    "ev_hurst" -> ((s, dir) => {
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc"))
        .withColumn("t", row_number().over(
          Window.partitionBy("event_type").orderBy("d")).cast("long") - 1)
        .localCheckpoint() // scanned once per block size
      import s.implicits._
      val wins = HurstWins.toDF("w")
      val rows = f.crossJoin(broadcast(wins))
        .select(col("event_type"), col("w"), col("sc"),
          expr("t div w").as("blk"), col("t"))
        .localCheckpoint() // prefix pass + block-total pass share it
      val wCum = Window.partitionBy("event_type", "w", "blk").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
      val withP = rows
        .withColumn("p", sum(dec(col("sc"))).over(wCum))
        .withColumn("j", count(lit(1)).over(wCum)) // 1-based in-block pos
      val btot = rows.groupBy("event_type", "w", "blk")
        .agg(count(lit(1)).as("bn"), sum("sc").as("bs"),
          sum(dec(col("sc")) * col("sc")).as("bq"))
        .where(col("bn") === col("w")) // complete blocks only
        .select(col("event_type"), col("w"), col("blk"), col("bs"),
          (col("bq") * col("w") - dec(col("bs")) * col("bs")).as("vd"))
      val wy = col("p") * col("w") - dec(col("j")) * col("bs")
      val rs = withP.join(btot, Seq("event_type", "w", "blk"))
        .groupBy("event_type", "w", "blk")
        .agg(max(wy).as("mxy"), min(wy).as("mny"), max("vd").as("vd"))
        .select(col("event_type"), col("w"), col("blk"),
          when(col("vd") > 0, (col("mxy") - col("mny")).cast("double") /
            sqrt(col("vd").cast("double"))).as("rs"))
        .where(col("rs").isNotNull)
      val mrs = rs.groupBy("event_type", "w")
        .agg((aggregate(
          transform(array_sort(collect_list(struct(col("blk"), col("rs").as("r")))),
            x => x.getField("r")),
          lit(0.0), (acc, t) => acc + t) /
          count(lit(1)).cast("double")).as("mrs"))
      val piv = mrs.groupBy("event_type")
        .agg(max(when(col("w") === HurstWins(0), col("mrs"))).as("rs_a"),
          max(when(col("w") === HurstWins(1), col("mrs"))).as("rs_b"),
          max(when(col("w") === HurstWins(2), col("mrs"))).as("rs_c"))
      val nd = f.groupBy("event_type").agg(count(lit(1)).as("n_days"))
      val ok = col("rs_a").isNotNull && col("rs_b").isNotNull &&
        col("rs_c").isNotNull &&
        col("rs_a") > 0 && col("rs_b") > 0 && col("rs_c") > 0
      nd.join(piv, Seq("event_type"), "left")
        .select(col("event_type"), col("n_days"),
          round(col("rs_a"), 6).as("rs_w5"),
          round(col("rs_b"), 6).as("rs_w10"),
          round(col("rs_c"), 6).as("rs_w15"),
          round(when(ok,
            lit(HurstCoef(HurstWins(0))) * log(col("rs_a")) +
              lit(HurstCoef(HurstWins(1))) * log(col("rs_b")) +
              lit(HurstCoef(HurstWins(2))) * log(col("rs_c"))), 6)
            .as("hurst"))
        .orderBy("event_type")
    }),

    // Pairwise lag-1 Granger-causality F test over the per-type daily
    // totals (Granger 1969) — "does type X's yesterday improve the
    // prediction of type Y's today beyond Y's own yesterday": restricted
    // model y_t ~ 1 + y_{t−1}, unrestricted adds x_{t−1};
    // F = (n−3)·(RSS_r − RSS_u)/RSS_u with 1 and n−3 dfs. Every centered
    // second moment is the exact integer n·Σab − Σa·Σb in
    // decimal(38,0)/HUGEINT off ONE (pair, day) frame; the RSS terms use
    // the closed two-regressor forms (RSS·n cancels in F, so no division
    // by n ever happens): R_r = Cyy − Cyl²/Cll and
    // R_u = Cyy − (Cxx·Cyl² − 2·Clx·Cyl·Cyx + Cll·Cyx²)/(Cll·Cxx − Clx²),
    // evaluated as the identical double expression on both engines
    // (products of C's exceed 38 digits, so the combination is double by
    // construction — the gr_assortativity discipline), round(6). NULL
    // when the lag design is collinear (det ≤ 0, Cll ≤ 0) or RSS_u ≤ 0.
    // Scale: one corpus (type, day) agg; the GLOBAL day spine zero-fills
    // every type over the same calendar so all pairs share n; the pair
    // frame is types²×days metadata joined on the day key.
    //
    // Streaming-twin adjudication: retrospective (the ev_cusum_cp
    // class) — the centered moments use the final n and the full-series
    // sums, so the F statistic is undefined until the window closes;
    // an online form would be a different operator (recursive least
    // squares), not a twin of this one.
    "ev_granger" -> ((s, dir) => {
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
      val rng = d.agg(min("d").as("mn"), max("d").as("mx"))
      val types = d.select("event_type").distinct()
      val spine = types.crossJoin(broadcast(rng))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val wLag = Window.partitionBy("event_type").orderBy("d")
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc"))
        .withColumn("lagv", lag(col("sc"), 1).over(wLag))
        .where(col("lagv").isNotNull)
        .localCheckpoint() // both sides of the pair join read it
      val xs = f.select(col("event_type").as("type_x"), col("d"),
        col("lagv").as("x"))
      val ys = f.select(col("event_type").as("type_y"), col("d"),
        col("sc").as("y"), col("lagv").as("l"))
      val g = ys.join(xs, "d")
        .where(col("type_x") =!= col("type_y"))
        .groupBy("type_x", "type_y")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("y"))).as("sy"), sum(dec(col("l"))).as("sl"),
          sum(dec(col("x"))).as("sx"),
          sum(dec(col("y")) * col("y")).as("syy"),
          sum(dec(col("l")) * col("l")).as("sll"),
          sum(dec(col("x")) * col("x")).as("sxx"),
          sum(dec(col("y")) * col("l")).as("syl"),
          sum(dec(col("y")) * col("x")).as("syx"),
          sum(dec(col("l")) * col("x")).as("slx"))
      def c2(sab: String, sa: String, sb: String) =
        (col("n") * col(sab) - col(sa) * col(sb)).cast("double")
      val (cyy, cll, cxx) = (c2("syy", "sy", "sy"), c2("sll", "sl", "sl"),
        c2("sxx", "sx", "sx"))
      val (cyl, cyx, clx) = (c2("syl", "sy", "sl"), c2("syx", "sy", "sx"),
        c2("slx", "sl", "sx"))
      val det = cll * cxx - clx * clx
      val rssR = cyy - cyl * cyl / cll
      val rssU = cyy -
        (cxx * cyl * cyl - lit(2.0) * clx * cyl * cyx + cll * cyx * cyx) / det
      val ok = col("n") > 3 && cll > 0 && det > 0 && rssU > 0
      g.select(col("type_x"), col("type_y"), col("n"),
          round(when(ok, (col("n") - 3).cast("double") *
            (rssR - rssU) / rssU), 6).as("f_stat"),
          round(when(ok, rssU / rssR), 6).as("rss_ratio"))
        .orderBy("type_x", "type_y")
    }),

    // Entropy rate of the event-type Markov chain (Shannon 1948;
    // Cover & Thomas ch. 4) — the one-number "how predictable is the
    // next action given the current one" that ev_markov's stationary
    // distribution and ev_user_entropy's marginal entropy both miss:
    // H_rate = Σ_f π_f·H(next | f) with π the empirical from-state
    // frequency and H(next|f) = Σ_t (c_ft/R_f)·ln(R_f/c_ft). Counts stay
    // integer to each term's two double casts; per-from terms fold in
    // to-state-sorted order, both engines (the prof_mutual_info
    // list_reduce parity). Scale: the ev_markov shape — ONE user-keyed
    // lag window over the corpus + one (from, to) count agg; everything
    // downstream rides the types² metadata frame.
    //
    // Streaming-twin adjudication: same verdict as ev_markov — the only
    // data-scale state is the (from, to) transition count, which
    // Structured Streaming's built-in keyed count (fed by the
    // SessionPathProcessor-shaped per-user previous-type lag) maintains
    // incrementally; the entropy arithmetic runs on the types² frame per
    // trigger. Nothing bespoke to carry, so no custom processor exists.
    "ev_entropy_rate" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("f", lag(col("event_type"), 1).over(w))
        .where(col("f").isNotNull)
        .groupBy(col("f"), col("event_type").as("t"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // row sums + terms both ride this types² frame
      val rf = tr.groupBy("f").agg(sum("c").as("rf"))
      val nn = tr.agg(sum("c").as("nn"))
      val term = (col("c").cast("double") / col("rf").cast("double")) *
        log(col("rf").cast("double") / col("c").cast("double"))
      tr.join(broadcast(rf), "f")
        .groupBy("f")
        .agg(max("rf").as("n_out"), countDistinct("t").as("k_next"),
          aggregate(
            transform(array_sort(collect_list(struct(col("t"), term.as("tm")))),
              x => x.getField("tm")),
            lit(0.0), (acc, t) => acc + t).as("h"))
        .crossJoin(broadcast(nn))
        .select(col("f").as("event_type"), col("n_out"), col("k_next"),
          round(col("n_out").cast("double") / col("nn").cast("double"), 6)
            .as("pi"),
          round(col("h"), 6).as("h_cond"),
          round((col("n_out").cast("double") / col("nn").cast("double")) *
            col("h"), 6).as("rate_contrib"))
        .orderBy("event_type")
    }),

    // Burstiness coefficient of the per-type arrival process (Goh &
    // Barabási 2008, EPL 81): B = (σ−μ)/(σ+μ) over inter-event gaps —
    // the one-number companion to ev_interarrival's histogram (B → −1
    // periodic, 0 Poisson, → 1 bursty), and the regime gate for every
    // rate model downstream. Division-free to ONE sqrt: with the
    // population identity σ = √(n·Σt²−(Σt)²)/n and μ = Σt/n the n's
    // cancel, so B = (√D − Σt)/(√D + Σt) with D = n·Σt² − (Σt)² an
    // exact decimal(38,0)/HUGEINT integer (µs gaps; Σt² ≤ n·(day µs)²
    // holds 38 digits to ~1e13 gaps). Gaps come from the ev_interarrival
    // KeyedRank chunked lag (win=2) — never a plain per-type window.
    //
    // Streaming-twin adjudication: the (n, Σt, Σt²) triple is a plain
    // associative aggregate over gaps (the ev_seasonality class) —
    // built-in streaming aggregation maintains it; the only carried
    // state is the per-type previous-timestamp lag, which is the
    // EwmaProcessor's ring-of-1 degenerate case. Nothing bespoke.
    "ev_burstiness" -> ((s, dir) => {
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val ev = load(s, dir, "events")
        .select(col("event_type"), col("ts"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val ranked = graft.plans.KeyedRank.withRank(ev, "event_type",
        graft.plans.KeyedRank.adaptiveTimeBucket(ev, col("ts")),
        Seq(col("ts"), col("event_id")))
      val dup = graft.plans.KeyedRank.withTrailingChunks(ranked, 2, 1000)
      val w = Window.partitionBy("event_type", "g").orderBy("rk")
      val g = dup
        .withColumn("pus", lag("us", 1).over(w))
        .where(col("own") && col("pus").isNotNull)
        .select(col("event_type"), (col("us") - col("pus")).as("t"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(dec(col("t"))).as("st"),
          sum(dec(col("t")) * col("t")).as("stt"))
      val sd = sqrt((col("n") * col("stt") - col("st") * col("st"))
        .cast("double"))
      val stD = col("st").cast("double")
      g.select(col("event_type"), col("n").as("n_gaps"),
          round(col("st").cast("double") / col("n").cast("double") /
            lit(1e6), 6).as("mean_gap_s"),
          round(when(col("n") > 1 && col("st") > 0,
            (sd - stD) / (sd + stD)), 6).as("b_coef"))
        .orderBy("event_type")
    }),

    // Day-of-week seasonal strength per type — the variance-decomposition
    // answer to "is this metric weekly-seasonal enough to model":
    // one-way ANOVA of the zero-filled daily totals across the 7
    // day-of-week groups, reported as the F statistic AND the
    // STL-style strength = SS_between/SS_total (share of daily variance
    // the weekday explains). Group sums stay exact decimal/HUGEINT off
    // the types×days spine; the ONE order-sensitive double reduction
    // (Σ S_g²/n_g) folds in dow order on both engines (the a22
    // discipline; Spark weekday() = DuckDB isodow − 1, monotone, so the
    // fold orders agree); SS identities use the expanded correction-mean
    // forms so no per-group grand-mean join exists. Scale: one corpus
    // (type, day) agg; everything after is types×7 metadata.
    //
    // Streaming-twin adjudication: per-(type, dow) (n, Σ, Σ²) is a plain
    // associative aggregate over closed days (the ev_seasonality class);
    // built-in windowed aggregation maintains it. Nothing bespoke.
    "ev_seasonal_strength" -> ((s, dir) => {
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc"))
        .select(col("event_type"), weekday(col("d")).as("dow"), col("sc"))
      val g = f.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("ng"), sum(dec(col("sc"))).as("sg"),
          sum(dec(col("sc")) * col("sc")).as("qg"))
      val tot = g.groupBy("event_type")
        .agg(sum("ng").as("n"), sum("sg").as("st"), sum("qg").as("qt"),
          count(lit(1)).as("k"),
          aggregate(
            sort_array(collect_list(struct(col("dow"),
              (col("sg").cast("double") * col("sg").cast("double") /
                col("ng").cast("double")).as("t")))),
            lit(0.0), (acc, x) => acc + x.getField("t")).as("aa"))
      val cm = col("st").cast("double") * col("st").cast("double") /
        col("n").cast("double")
      val ssb = col("aa") - cm
      val ssw = col("qt").cast("double") - col("aa")
      val sst = col("qt").cast("double") - cm
      val okF = col("k") > 1 && col("n") > col("k") && ssw > 0
      tot.select(col("event_type"), col("n").as("n_days"),
          col("k").as("k_dow"),
          round(when(okF, (ssb / (col("k") - 1).cast("double")) /
            (ssw / (col("n") - col("k")).cast("double"))), 6).as("f_stat"),
          round(when(sst > 0, ssb / sst), 6).as("seasonal_strength"))
        .orderBy("event_type")
    }),

    // Classical seasonal decomposition of the per-type daily series
    // (the moving-average decomposition behind statsmodels
    // seasonal_decompose; Makridakis et al. ch. 3): value = trend +
    // seasonal + residual with trend the centered 7-day moving average,
    // seasonal the CENTERED day-of-week means of the detrended series,
    // residual the remainder. Exactness: the 7-day sum S7 is an exact
    // decimal window sum, the detrended series stays integer by
    // 7-scaling (d7 = 7·x − S7 — the ev_hurst w-scaling trick), the
    // dow means are each ONE double division, and the dow-mean centering
    // folds its ≤7 terms in dow order on both engines. Trend/residual
    // are NULL on the 3-day edges (incomplete window), the standard
    // convention. Scale: one corpus (type, day) agg; the ±3 window and
    // every later frame ride types×days metadata; seasonal indexes join
    // back broadcast.
    //
    // Streaming-twin adjudication: the centered window needs 3 FUTURE
    // days, so the operator is non-causal by definition (the trailing
    // variant a stream would run is ev_ewma's territory, which has its
    // transformWithState twin); the batch form is the only consumer.
    "ev_decompose" -> ((s, dir) => {
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
        .localCheckpoint()
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val w7 = Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(-3, 3)
      val g = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc"))
        .withColumn("s7", sum(dec(col("sc"))).over(w7))
        .withColumn("n7", count(lit(1)).over(w7))
        .withColumn("d7", when(col("n7") === 7,
          dec(col("sc")) * 7 - col("s7")))
        .withColumn("dow", weekday(col("d")))
        .localCheckpoint() // seasonal-index agg + final output share it
      val sidx = g.where(col("d7").isNotNull)
        .groupBy("event_type", "dow")
        .agg((sum("d7").cast("double") /
          (lit(7.0) * count(lit(1)).cast("double"))).as("m"))
      val cen = sidx.groupBy("event_type")
        .agg(aggregate(
          sort_array(collect_list(struct(col("dow"), col("m").as("mm")))),
          lit(0.0), (acc, x) => acc + x.getField("mm")).as("sm"),
          count(lit(1)).as("kd"))
      val sea = sidx.join(broadcast(cen), "event_type")
        .select(col("event_type"), col("dow"),
          (col("m") - col("sm") / col("kd").cast("double")).as("seas"))
      g.join(broadcast(sea), Seq("event_type", "dow"), "left")
        .select(col("event_type"), col("d").as("day"),
          round(col("sc").cast("double") / lit(100.0), 6).as("value"),
          round(when(col("n7") === 7,
            col("s7").cast("double") / lit(7.0) / lit(100.0)), 6).as("trend"),
          round(col("seas") / lit(100.0), 6).as("seasonal"),
          round(when(col("n7") === 7,
            col("d7").cast("double") / lit(7.0) / lit(100.0) -
              col("seas") / lit(100.0)), 6).as("residual"))
        .orderBy("event_type", "day")
    }),

    // CUSUM change-point detection over the per-type daily totals — the

    // CUSUM change-point detection over the per-type daily totals — the
    // sequential monitoring statistic (Page 1954) behind "when did this
    // metric shift". The max(0, C+x−μ) recurrence has the closed form
    // C_t = P_t − min(0, min_{u≤t} P_u) with P the prefix sum of
    // deviations — so the whole detector is a prefix-sum window plus a
    // running-min window, NO sequential fold. Division-free: deviations
    // scale by n (n·x_t − S instead of x_t − S/n), keeping every value
    // an exact integer in decimal(38,0)/HUGEINT; the change point is
    // the argmax day of C (ties → earliest, via one min-struct agg).
    // Scale: one corpus (type, day) agg; spine, windows, and the argmax
    // ride the types×days metadata frame; per-type totals join back
    // broadcast. (Named _cp — change point — to keep visual distance
    // from ev_cumsum, the running-total ladder.)
    //
    // Streaming-twin adjudication (round-14): this op has NO
    // transformWithState twin BY CONSTRUCTION — the statistic is
    // retrospective: every deviation is measured against the
    // FULL-SERIES totals (n·x_t − S uses the final n and S), so no
    // causal processor can emit a single row before the stream closes;
    // "fold it as state" degenerates to buffering the whole series.
    // The ONLINE form of CUSUM change detection — deviations against
    // the running mean up to t — IS the Page–Hinkley statistic, and
    // that already has its carried-state twin
    // (streaming.StatefulOps.driftMonitor, bit-equal pinned). The batch
    // form is the only consumer of this exact statistic.
    "ev_cusum_cp" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
        .localCheckpoint()
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc")).localCheckpoint()
      val tot = f.groupBy(col("event_type").as("tt"))
        .agg(count(lit(1)).as("n"), sum("sc").as("s"))
      val wCum = Window.partitionBy("event_type").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
      val dev = (col("sc").cast("decimal(38,0)") * col("n") - col("s"))
      val cusum = f.join(broadcast(tot), col("event_type") === col("tt"))
        .withColumn("p", sum(dev).over(wCum))
        .withColumn("rmin", min(col("p")).over(wCum))
        .withColumn("cu", col("p") - least(col("rmin"), lit(0).cast("decimal(38,0)")))
      cusum.groupBy("event_type")
        .agg(max("n").as("n_days"),
          max(struct(col("cu").as("c"),
            (lit(0L) - datediff(col("d"), lit("1970-01-01").cast("date")))
              .as("nd"),
            col("d").as("day"))).as("t"))
        // Output-type discipline (gr_hits pattern): C accumulates
        // decimal(38,0) internally, the OUTPUT is BIGINT. Bound:
        // |C| ≤ 2·n²·max|daily cents| — at sf1 (1M events, ≤1e5-cent
        // values, ~365-day span) that is ~1.5e13, and int64 headroom
        // survives another ~500× in event volume; the internal decimal
        // stays exact far beyond that. Raw DECIMAL outputs diverge in
        // the driver's hash canonicalization (round-11 red).
        .select(col("event_type"), col("n_days"),
          col("t.day").as("change_day"),
          col("t.c").cast("long").as("cusum_scaled"),
          round(col("t.c").cast("double") / col("n_days") / 100.0, 6)
            .as("cusum_mean_excess"))
        .orderBy("event_type")
    }),

    // Local-peak detection over the per-type daily totals — the
    // monitoring primitive behind "which days spiked?": a day is a peak
    // when its total STRICTLY exceeds both calendar neighbors (strict on
    // both sides, so plateaus are not peaks and the verdict is
    // deterministic), with prominence = cnt − max(prev, next). Shape:
    // one (type, day) agg, the shared zero-filled calendar spine, one
    // lag/lead pass over the spine (rows per partition bounded by the
    // calendar — the ev_cusum_cp window provenance), one filter.
    // All-integer output; endpoints (no neighbor) are excluded on both
    // engines by the NOT NULL guard.
    "ev_peak_detect" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
        .localCheckpoint()
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc"))
      val w = Window.partitionBy("event_type").orderBy("d")
      f.withColumn("prev", lag("sc", 1).over(w))
        .withColumn("nxt", lead("sc", 1).over(w))
        .where(col("prev").isNotNull && col("nxt").isNotNull &&
          col("sc") > col("prev") && col("sc") > col("nxt"))
        .select(col("event_type"), col("d").as("day"), col("sc").as("cents"),
          col("prev").as("prev_cents"), col("nxt").as("next_cents"),
          (col("sc") - greatest(col("prev"), col("nxt"))).as("prominence"))
        .orderBy("event_type", "day")
    }),

    // Mann–Kendall trend test per type over the daily totals — the
    // nonparametric "is this metric trending" answer (no normality or
    // linearity assumption; the standard first question to a monitoring
    // series). S = Σ_{i<j} sgn(x_j − x_i) over the complete calendar
    // spine; Var carries the tie correction (n(n−1)(2n+5) −
    // Σ t(t−1)(2t+5))/18; z applies the ±1 continuity correction.
    // Exactness: S and both variance numerators are exact integers
    // (decimal(38,0)/HUGEINT); z is one identical double expression,
    // round(6), NULL when Var = 0 (constant series). Scale: the pair
    // explode is the day-span² frame per type — METADATA-scale (the
    // a17_mwu histogram-pairs argument: 10 years = 3650 days = 13M
    // pairs per type, independent of event count); everything else is
    // one corpus (type, day) agg.
    "ev_mk_trend" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
        .localCheckpoint()
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc")).localCheckpoint()
      val a = f.select(col("event_type"), col("d").as("da"), col("sc").as("xa"))
      val b = f.select(col("event_type"), col("d").as("db"), col("sc").as("xb"))
      val sS = a.join(b, Seq("event_type")).where(col("da") < col("db"))
        .groupBy("event_type")
        .agg(sum(signum(col("xb") - col("xa")).cast("long")).as("s_stat"))
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      val ties = f.groupBy("event_type", "sc").agg(count(lit(1)).as("m"))
        .groupBy("event_type")
        .agg(sum("m").as("n"),
          sum(dec(col("m")) * (col("m") - 1) * (col("m") * 2 + 5)).as("tt"))
      val varNum = dec(col("n")) * (col("n") - 1) * (col("n") * 2 + 5) - col("tt")
      val zNum = when(col("s_stat") > 0, col("s_stat") - 1)
        .when(col("s_stat") < 0, col("s_stat") + 1)
        .otherwise(lit(0L))
      // Output-type discipline (gr_hits pattern, Graph.scala:511): the
      // variance numerator accumulates decimal(38,0) internally but the
      // OUTPUT column is BIGINT — n here is the day-span (n = 3650 days
      // for 10 years gives n(n-1)(2n+5) ≈ 9.7e10; int64 holds to
      // n ≈ 1.66e6 days ≈ 4500 years), so the cast can never overflow
      // on any calendar-bounded input. Raw DECIMAL outputs diverge in
      // the driver's cross-engine hash canonicalization (round-11 red).
      sS.join(ties, "event_type")
        .select(col("event_type"), col("n").as("n_days"), col("s_stat"),
          varNum.cast("long").as("var_num18"),
          round(when(varNum > 0,
            zNum.cast("double") /
              sqrt(varNum.cast("double") / 18.0)), 6).as("z"))
        .orderBy("event_type")
    }),

    // Theil–Sen robust trend slope per type over the daily totals — the
    // magnitude companion to ev_mk_trend (MK answers "is there a trend";
    // Theil–Sen answers "how steep", with a 29.3% breakdown point —
    // Theil 1950 / Sen 1968). The estimator is the MEDIAN of all
    // pairwise slopes (sc_b − sc_a)/(db − da) over the complete calendar
    // spine. Exactness: the pair frame carries integer (dy, dx); the one
    // double division is IEEE-correctly-rounded identically on both
    // engines, and median SELECTION is deterministic — row_number over
    // (slope, da, db) with the integer day pair breaking double ties —
    // so round(6) touches only the emitted value. Scale: the pair
    // explode is the day-span² METADATA frame per type (the ev_mk_trend
    // argument: 10 years = 13M pairs per type, independent of event
    // count); the selection window partitions per type over that same
    // bounded frame.
    "ev_theil_sen" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
        .localCheckpoint()
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc")).localCheckpoint()
      val a = f.select(col("event_type"), col("d").as("da"), col("sc").as("xa"))
      val b = f.select(col("event_type"), col("d").as("db"), col("sc").as("xb"))
      val pairs = a.join(b, Seq("event_type")).where(col("da") < col("db"))
        .select(col("event_type"), col("da"), col("db"),
          ((col("xb") - col("xa")).cast("double") /
            datediff(col("db"), col("da")).cast("double")).as("slope"))
      val np = pairs.groupBy(col("event_type").as("tt"))
        .agg(count(lit(1)).as("n_pairs"))
      val wSel = Window.partitionBy("event_type")
        .orderBy(col("slope"), col("da"), col("db"))
      // join below the window (see ev_runs_test): the selection window
      // rides the pair metadata frame above the n_pairs aggregate.
      pairs.join(broadcast(np), col("event_type") === col("tt"))
        .withColumn("rn", row_number().over(wSel))
        .where(col("rn") ===
          floor((col("n_pairs") + 1) / 2).cast("long")) // exact lower median
        .select(col("event_type"), col("n_pairs"),
          round(col("slope"), 6).as("slope_cents_per_day"))
        .orderBy("event_type")
    }),

    // Wald–Wolfowitz runs test per type on the daily totals — the
    // randomness screen that catches regime stickiness a trend test
    // misses (long runs above/below the median ⇒ autocorrelated or
    // shifted process even when the MK slope is flat). Days EQUAL to the
    // median are discarded (the standard convention); runs count R is
    // 1 + Σ sign changes over the surviving day-ordered sequence. The
    // reference median is the exact lower median of the daily totals
    // (row_number over (sc, d) — integer sort, deterministic tiebreak).
    // Exactness: n_above/n_below/R are integers; z = (R − μ)/σ with
    // μ = 2·n1·n2/N + 1 and σ² = 2·n1·n2·(2·n1·n2 − N)/(N²(N−1)) is one
    // identical double expression, round(6), NULL when either side is
    // empty or σ² = 0. Scale: everything above the daily agg rides the
    // types×days metadata frame.
    "ev_runs_test" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
        .localCheckpoint()
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc")).localCheckpoint()
      val wMed = Window.partitionBy("event_type").orderBy("sc", "d")
      val nDays = f.groupBy(col("event_type").as("tt"))
        .agg(count(lit(1)).as("nd"))
      // broadcast-join the per-type day count BELOW the median-rank window
      // so the plan shows what is true — the window runs above aggregated
      // (type, day) metadata, not row-level data (the checkpointed spine
      // otherwise hides its aggregate from the ScaleDesignSpec sweep).
      val med = f.join(broadcast(nDays), col("event_type") === col("tt"))
        .withColumn("rn", row_number().over(wMed))
        .where(col("rn") === floor((col("nd") + 1) / 2).cast("long"))
        .select(col("event_type"), col("sc").as("med"))
      val wOrd = Window.partitionBy("event_type").orderBy("d")
      val seq0 = f.join(broadcast(med), "event_type")
        .where(col("sc") =!= col("med"))
        .withColumn("above", (col("sc") > col("med")).cast("long"))
        .withColumn("prev", lag("above", 1).over(wOrd))
      val g = seq0.groupBy("event_type")
        .agg(sum("above").as("n_above"),
          sum(lit(1L) - col("above")).as("n_below"),
          (sum(when(col("prev").isNull || col("prev") =!= col("above"), 1L)
            .otherwise(0L))).as("runs"))
      val n1 = col("n_above").cast("double")
      val n2 = col("n_below").cast("double")
      val nn = n1 + n2
      val mu = lit(2.0) * n1 * n2 / nn + 1.0
      val s2 = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - nn) /
        (nn * nn * (nn - 1))
      g.select(col("event_type"), col("n_above"), col("n_below"), col("runs"),
          round(when(col("n_above") > 0 && col("n_below") > 0 && s2 > 0,
            (col("runs").cast("double") - mu) / sqrt(s2)), 6).as("z"))
        .orderBy("event_type")
    }),

    // Holt double-exponential smoothing (level + trend, Holt 1957) over
    // the per-type daily totals, with a one-step-ahead SSE backtest and
    // a 7-day-ahead forecast — the trend-aware upgrade of ev_ewma that a
    // capacity planner actually runs. The recursion l′ = α·x + (1−α)(l+b),
    // b′ = β(l′−l) + (1−β)b cannot unroll into window sums, so the
    // per-type day series (calendar-bounded — metadata scale, the same
    // class as every spine query) folds SEQUENTIALLY through one
    // `aggregate` higher-order expression with a (l, b, sse) struct
    // state; the DuckDB oracle runs the textbook recursive CTE over the
    // day index — the identical arithmetic in the identical order, so
    // the doubles match bit-for-bit (α = 0.5, β = 0.25 are dyadic).
    // NOTE: DuckDB 1.0's list_reduce is NOT usable here — struct_pack
    // fields evaluate sequentially with `acc` rebound mid-struct, so a
    // fold state with interdependent fields silently computes the wrong
    // recursion; the recursive CTE sidesteps the footgun.
    // Syntetos–Boylan demand classification (Syntetos, Boylan & Croston
    // 2005) — the screen that decides WHICH forecaster a series gets
    // (smooth → exponential smoothing, intermittent → Croston, erratic/
    // lumpy → SBA or bootstrap): ADI = periods per demand period and
    // CV² of the nonzero demand sizes, against the published 1.32/0.49
    // cutoffs. Same value>99.5 daily spine as ev_croston; ADI and the
    // CV² power sums are exact integers until the two final double
    // ratios (population variance form, identical trees both engines).
    "ev_sbc_class" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          (col("value") > 99.5).cast("long").as("hi"))
        .groupBy("event_type", "d").agg(sum("hi").as("c"))
        .localCheckpoint()
      val span = d.groupBy("event_type")
        .agg((datediff(max("d"), min("d")) + 1).cast("long").as("n_days"))
      val g = d.where(col("c") > 0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("m"), sum("c").as("s1"),
          sum(col("c") * col("c")).as("s2"))
      val mu = col("s1").cast("double") / col("m").cast("double")
      val cv2 = (col("s2").cast("double") / col("m").cast("double") - mu * mu) /
        (mu * mu)
      val adi = col("n_days").cast("double") / col("m").cast("double")
      g.join(broadcast(span), "event_type")
        .select(col("event_type"), col("n_days"), col("m").as("n_demand_days"),
          round(adi, 6).as("adi"), round(cv2, 6).as("cv2"),
          when(adi < 1.32 && cv2 < 0.49, "smooth")
            .when(adi >= 1.32 && cv2 < 0.49, "intermittent")
            .when(adi < 1.32, "erratic")
            .otherwise("lumpy").as("sbc_class"))
        .orderBy("event_type")
    }),

    // Croston's method (Croston 1972) — THE intermittent-demand
    // forecaster (sparse series with many zero days defeat plain
    // exponential smoothing; Croston smooths the nonzero demand SIZE z
    // and the inter-demand INTERVAL p separately, forecast = z/p). The
    // monitored series is each type's daily count of high-value events
    // (value > 99.5 — the ~0.5% tail, so the series is genuinely
    // intermittent at every SF) over the zero-filled calendar spine.
    // α = 0.25 is dyadic; the recursion (first demand seeds z = x,
    // p = elapsed q; later demands z' = 0.25x + 0.75z,
    // p' = 0.25q + 0.75p, q resets to 1; zero days just grow q) folds
    // SEQUENTIALLY through one `aggregate` expression, the oracle runs
    // the identical recursive CTE (the ev_holt discipline — never
    // list_reduce), so the doubles match bit-for-bit.
    "ev_croston" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          (col("value") > 99.5).cast("long").as("hi"))
        .groupBy("event_type", "d").agg(sum("hi").as("c"))
        .localCheckpoint()
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("c"))
      val arr = f.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("d"),
          col("c").cast("double").as("v")))).as("a"))
        .select(col("event_type"), size(col("a")).cast("long").as("n_days"),
          transform(col("a"), x => x.getField("v")).as("xs"))
      val init = struct(lit(0.0).as("z"), lit(0.0).as("p"), lit(1.0).as("q"),
        lit(0L).as("nd"))
      val folded = arr.select(col("event_type"), col("n_days"),
        aggregate(col("xs"), init, (acc, x) => {
          val z0 = acc.getField("z"); val p0 = acc.getField("p")
          val q0 = acc.getField("q"); val nd0 = acc.getField("nd")
          struct(
            when(x > 0,
              when(nd0 === 0, x).otherwise(lit(0.25) * x + lit(0.75) * z0))
              .otherwise(z0).as("z"),
            when(x > 0,
              when(nd0 === 0, q0).otherwise(lit(0.25) * q0 + lit(0.75) * p0))
              .otherwise(p0).as("p"),
            when(x > 0, lit(1.0)).otherwise(q0 + 1).as("q"),
            when(x > 0, nd0 + 1).otherwise(nd0).as("nd"))
        }).as("st"))
      folded.select(col("event_type"), col("n_days"),
        col("st.nd").as("n_demand_days"),
        round(col("st.z"), 6).as("demand_size"),
        round(col("st.p"), 6).as("demand_interval"),
        round(when(col("st.p") > 0, col("st.z") / col("st.p")), 6)
          .as("croston_forecast"))
        .orderBy("event_type")
    }),

    // Page–Hinkley drift detector (Page 1954, the Gama et al. 2014
    // streaming-drift form) over each type's daily-mean series — the
    // change-monitor a production pipeline runs on data-quality metrics:
    // m_t = m_{t-1} + (x_t − x̄_t − δ) with x̄_t the running mean,
    // PH_t = m_t − min_{i≤t} m_i, alarm at the first day PH > λ
    // (δ = 0.1 value units of drift tolerance, λ = 5). Like ev_holt the
    // recursion cannot unroll into window sums (x̄_t re-normalizes every
    // step), so the calendar-bounded day series folds SEQUENTIALLY
    // through one `aggregate` expression with an (i, s, m, mn, alarm)
    // state; the oracle runs the identical recursion as a recursive CTE
    // over the day index (NOT list_reduce — the ev_holt DuckDB 1.0
    // struct-rebinding footgun), so the double stream matches
    // bit-for-bit.
    "ev_page_hinkley" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d")
        .agg(sum("c").as("sc"), count(lit(1)).as("cnt"))
        .localCheckpoint()
      val arr = d.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("d"),
          (col("sc").cast("double") / (lit(100.0) * col("cnt").cast("double")))
            .as("v")))).as("a"))
        .select(col("event_type"), size(col("a")).cast("long").as("n_days"),
          transform(col("a"), x => x.getField("v")).as("xs"))
      val init = struct(lit(0L).as("i"), lit(0.0).as("s"), lit(0.0).as("m"),
        lit(0.0).as("mn"), lit(0L).as("alarm"))
      val folded = arr.select(col("event_type"), col("n_days"),
        aggregate(col("xs"), init, (acc, x) => {
          val i2 = acc.getField("i") + 1
          val s2 = acc.getField("s") + x
          val m2 = acc.getField("m") +
            (x - s2 / i2.cast("double") - lit(0.1))
          val mn2 = least(acc.getField("mn"), m2)
          struct(i2.as("i"), s2.as("s"), m2.as("m"), mn2.as("mn"),
            when(acc.getField("alarm") === 0 && m2 - mn2 > 5.0, i2)
              .otherwise(acc.getField("alarm")).as("alarm"))
        }).as("st"))
      folded.select(col("event_type"), col("n_days"),
        round(col("st.m"), 6).as("cum_dev"),
        round(col("st.mn"), 6).as("min_dev"),
        round(col("st.m") - col("st.mn"), 6).as("ph_stat"),
        col("st.alarm").as("alarm_day"))
        .orderBy("event_type")
    }),

    "ev_holt" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
        .localCheckpoint()
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc"))
      val arr = f.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("d"),
          (col("sc").cast("double") / 100).as("v")))).as("a"))
        .select(col("event_type"), size(col("a")).cast("long").as("n_days"),
          transform(col("a"), x => x.getField("v")).as("xs"))
      val init = struct(element_at(col("xs"), 1).as("l"),
        lit(0.0).as("b"), lit(0.0).as("sse"))
      val folded = arr.select(col("event_type"), col("n_days"),
        aggregate(slice(col("xs"), lit(2), size(col("xs")) - 1), init,
          (acc, x) => {
            val l0 = acc.getField("l"); val b0 = acc.getField("b")
            val l2 = lit(0.5) * x + lit(0.5) * (l0 + b0)
            val err = x - (l0 + b0)
            struct(l2.as("l"),
              (lit(0.25) * (l2 - l0) + lit(0.75) * b0).as("b"),
              (acc.getField("sse") + err * err).as("sse"))
          }).as("st"))
      folded.select(col("event_type"), col("n_days"),
        round(col("st.l"), 6).as("level"),
        round(col("st.b"), 6).as("trend"),
        round(col("st.l") + lit(7.0) * col("st.b"), 6).as("forecast_7d"),
        round(col("st.sse"), 6).as("sse"))
        .orderBy("event_type")
    }),

    // Kendall τ-b cross-association between every PAIR of event types'
    // daily total series — "do clicks and purchases co-move day to
    // day?", the rank-based twin of a Pearson cross-correlation that
    // survives outliers and level shifts. Both series ride ONE shared
    // zero-filled calendar (a global [min, max] spine, so every pair
    // compares the same day set); S comes from the Knight (1966)
    // O(n log n) formulation — sort each pair's day series by (x asc,
    // y asc), count the strict inversions Q of the y-sequence with the
    // merge-sort `inv_count` expression (Q = the discordant pairs
    // exactly: x-tied pairs sort y ascending so contribute no strict
    // inversion, and y-ties are not strict), then
    // S = (n0 − n1 − n2 + n3) − 2Q with n0 = C(n,2) and n1/n2/n3 =
    // Σ C(t,2) over the x-, y-, and joint-(x,y) value histograms —
    // ALL integers (the ev_mk_trend discipline), only the final τ-b is
    // a double, round(6), NULL when a series is constant. The oracle's
    // all-pairs SQL computes the identical integer S, so the hash match
    // doubles as a proof of the Knight identity on real data. Scale:
    // the biggest frame is typePairs×days (the per-day pair join); the
    // old day-pair self-join (typePairs×days² — ~10⁷ rows per pair on a
    // multi-year calendar) is gone. Each pair's collected series is one
    // calendar-bounded array row (the ev_holt collect discipline;
    // ~4M-day span ≈ 32 MB worst case bounds it).
    "ev_kendall_xcorr" -> ((s, dir) => {
      graft.plans.ArrayExprs.register(s)
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
        .localCheckpoint()
      val rng = d.groupBy().agg(min("d").as("mn"), max("d").as("mx"))
      val spine = d.select("event_type").distinct()
        .crossJoin(broadcast(rng))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc")).localCheckpoint()
      val pt = f.select(col("event_type").as("t1"), col("d"), col("sc").as("x"))
        .join(f.select(col("event_type").as("t2"), col("d"), col("sc").as("y")), "d")
        .where(col("t1") < col("t2"))
        .localCheckpoint()
      val seqs = pt.groupBy("t1", "t2")
        .agg(count(lit(1)).as("n_days"),
          sort_array(collect_list(struct(col("x"), col("y")))).as("a"))
        .select(col("t1"), col("t2"), col("n_days"),
          graft.plans.ArrayExprs.invCount(
            transform(col("a"), p => p.getField("y"))).as("q"))
      val nxy = pt.groupBy("t1", "t2", "x", "y")
        .agg(count(lit(1)).as("m"))
        .groupBy("t1", "t2").agg(sum(col("m") * (col("m") - 1)).as("nxy2"))
      val tx = f.groupBy(col("event_type").as("t"), col("sc"))
        .agg(count(lit(1)).as("m"))
        .groupBy("t").agg(sum(col("m") * (col("m") - 1)).as("nt2"))
      val n0 = expr("(n_days * (n_days - 1)) div 2")
      val sStat = (n0 - expr("ntx2 div 2") - expr("nty2 div 2") +
        expr("nxy2 div 2") - lit(2L) * col("q")).as("s_stat")
      val den = (n0 - expr("ntx2 div 2")) * (n0 - expr("nty2 div 2"))
      seqs.join(nxy, Seq("t1", "t2"))
        .join(broadcast(tx.select(col("t").as("t1"), col("nt2").as("ntx2"))), "t1")
        .join(broadcast(tx.select(col("t").as("t2"), col("nt2").as("nty2"))), "t2")
        .withColumn("s_stat", sStat)
        .select(col("t1"), col("t2"), col("n_days"), col("s_stat"),
          round(when(den > 0,
            col("s_stat").cast("double") / sqrt(den.cast("double"))), 6)
            .as("tau_b"))
        .orderBy("t1", "t2")
    }),

    // Seasonal-naive forecast backtest (the baseline every real
    // forecasting deployment must beat, and the denominator of the MASE
    // metric): per event type, forecast each day's value total as the
    // total 7 days earlier, evaluated against the one-day-naive on the
    // same day set — n, MAE, and MASE = ΣAE_sn / ΣAE_naive1. Exactness:
    // daily totals are integer cents on a COMPLETE per-type calendar
    // spine (absent days are true zeros — a lag over present-days-only
    // would compare the wrong calendar pairs), absolute errors are exact
    // integer sums, and only the two final ratios are doubles, round(6).
    // Scale: one corpus (type, day) agg; the spine, lags, and rollup all
    // ride the types×days metadata frame above it.
    "ev_forecast_sn" -> ((s, dir) => {
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
        .localCheckpoint()
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"),
          explode(sequence(col("mn"), col("mx"))).as("d"))
      val w = Window.partitionBy("event_type").orderBy("d")
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc"))
        .withColumn("l7", lag("sc", 7).over(w))
        .withColumn("l1", lag("sc", 1).over(w))
        .where(col("l7").isNotNull && col("l1").isNotNull)
      f.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("sc") - col("l7"))).as("sae7"),
          sum(abs(col("sc") - col("l1"))).as("sae1"))
        .select(col("event_type"), col("n_days"),
          round(col("sae7").cast("double") / col("n_days") / 100.0, 6)
            .as("mae_sn"),
          round(col("sae1").cast("double") / col("n_days") / 100.0, 6)
            .as("mae_naive1"),
          round(col("sae7").cast("double") / nullif(col("sae1"), lit(0L)), 6)
            .as("mase"))
        .orderBy("event_type")
    }),

    // MATCH_RECOGNIZE-lite sequence detection: sessions where a signup is
    // followed by a purchase with NO error in between — the row-pattern
    // query (SQL:2016 MATCH_RECOGNIZE, which Spark lacks) expressed as
    // three keyed aggregates over in-session positions instead of a
    // pattern automaton: (1) first signup position per session, (2) first
    // purchase after it, (3) error count strictly between, every step an
    // integer min/count on the (user, sess)-keyed frame. Emits the
    // matched sessions with the step gap and the signup→purchase latency
    // (µs, exact). Scale: the t6 sessionization window (user-keyed) + the
    // per-position explode stays on (user, sess) keys end to end.
    "ev_pattern" -> ((s, dir) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapped = load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("pus", lag(unix_micros(col("ts")), 1).over(wOrd))
        .withColumn("new_sess",
          when(col("pus").isNull ||
            unix_micros(col("ts")) - col("pus") >= GapUs, 1L).otherwise(0L))
      val wSess = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wPos = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
      val rows = gapped
        .withColumn("sess", sum("new_sess").over(wSess))
        .withColumn("pos", row_number().over(wPos).cast("long"))
        .select("user_id", "sess", "pos", "event_type", "ts")
      val sign = rows.where(col("event_type") === "signup")
        .groupBy("user_id", "sess")
        .agg(min(struct(col("pos"), col("ts"))).as("s"))
        .select(col("user_id"), col("sess"), col("s.pos").as("ps"),
          col("s.ts").as("ts_s"))
      val purch = rows.join(sign, Seq("user_id", "sess"))
        .where(col("event_type") === "purchase" && col("pos") > col("ps"))
        .groupBy("user_id", "sess")
        .agg(min(struct(col("pos"), col("ts"))).as("p"))
        .select(col("user_id"), col("sess"), col("p.pos").as("pe"),
          col("p.ts").as("ts_p"))
      val matched = sign.join(purch, Seq("user_id", "sess"))
      val errs = rows.join(matched, Seq("user_id", "sess"))
        .where(col("event_type") === "error" &&
          col("pos") > col("ps") && col("pos") < col("pe"))
        .groupBy("user_id", "sess").agg(count(lit(1)).as("ne"))
      matched.join(errs, Seq("user_id", "sess"), "left")
        .na.fill(0L, Seq("ne"))
        .where(col("ne") === 0)
        .select(col("user_id"), col("sess"),
          col("ps").as("signup_pos"), col("pe").as("purchase_pos"),
          (col("pe") - col("ps") - 1).as("steps_between"),
          (unix_micros(col("ts_p")) - unix_micros(col("ts_s")))
            .as("latency_us"))
        .orderBy("user_id", "sess")
    }),

    // Session path mining (the "what do users do next" product-analytics
    // staple): sessionize per user at the 30-minute gap (the
    // t6_session_window construction), list each session's event types in
    // time order, emit every consecutive 3-step path, and count the
    // corpus-wide top paths. Scale shape: the session window partitions
    // on user_id (data-scale key), path explode is map-side off the
    // per-session list, one (path) count agg + TakeOrdered cut. All
    // counts integer; the only list op is an index transform both
    // engines define identically (1-based, len−2 windows).
    "ev_path" -> ((s, dir) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapped = load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("pus", lag(unix_micros(col("ts")), 1).over(wOrd))
        .withColumn("new_sess",
          when(col("pus").isNull ||
            unix_micros(col("ts")) - col("pus") >= GapUs, 1L).otherwise(0L))
      val wSess = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      val paths = gapped
        .withColumn("sess", sum("new_sess").over(wSess))
        .groupBy("user_id", "sess")
        .agg(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type")).as("t"))
        .where(size(col("t")) >= 3)
        .select(explode(transform(sequence(lit(1), size(col("t")) - 2),
          i => concat_ws(">", element_at(col("t"), i),
            element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
          .as("path"))
      paths.groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(PathTopN)
    }),

    // Power-user curve (the L28-style engagement-depth histogram): how
    // many users were active on exactly k distinct days, how many events
    // they generated, their share of the user base, and the survival
    // count (users active on >= k days) — the distribution product teams
    // read before defining "core user". All-integer: two keyed aggs
    // ((user, day) dedup → per-user depth) + one histogram agg; the
    // survival window and share division ride the day-span-scale
    // histogram frame above an aggregate, total via one-row broadcast.
    "ev_powerusers" -> ((s, dir) => {
      val perUser = load(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy("user_id", "day").agg(count(lit(1)).as("ev"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("days"), sum("ev").as("ev"))
      // localCheckpoint: the day-span-scale histogram feeds two consumers
      // (the total rollup + the output row build) — without it the whole
      // 3-exchange corpus chain re-plans for the one-row total.
      val hist = perUser.groupBy(col("days").as("active_days"))
        .agg(count(lit(1)).as("n_users"), sum("ev").as("n_events"))
        .localCheckpoint()
      val tot = hist.groupBy().agg(sum("n_users").as("nu"))
      val wSurv = Window.orderBy(col("active_days").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      hist.crossJoin(broadcast(tot))
        .withColumn("cum_users", sum("n_users").over(wSurv))
        .select(col("active_days"), col("n_users"), col("n_events"),
          round(col("n_users").cast("double") / col("nu"), 6).as("user_share"),
          col("cum_users"))
        .orderBy("active_days")
    }),

    // RFM quintile segmentation — the classic recency/frequency/monetary
    // user scoring, 100 TB-shaped: per-user metrics come from ONE keyed
    // aggregate (recency as the integer last-active epoch day — later =
    // better, so all three metrics score "higher is better" uniformly),
    // and the quintile boundaries are NOT a user-scale rank window: each
    // threshold t_k is the exact order statistic at rank ⌈k·n/5⌉, found
    // by the a15_quantile_2phase bucket-then-refine ladder so NO frame
    // ever scales with the metric's value domain. Phase 1 buckets each
    // metric into ≤ 65537 ADAPTIVE-width buckets (width from a one-row
    // min/max — the KeyedRank span discipline; monetary's distinct-cents
    // domain grows toward USER cardinality at 100×, which is why the
    // round-10 distinct-value histogram + unpartitioned cum window was a
    // single-task trap), a cumulative count over the bounded bucket
    // histogram locates each target rank's bucket, and phase 2 rescans
    // ONLY the located buckets (broadcast join) to extract the exact
    // k-th value with an in-bucket row_number. Thresholds broadcast back
    // as ONE row; score = 1 + # thresholds strictly below the user's
    // value — pure integer compares, bit-identical cross-engine;
    // monetary stays exact in integer cents. The DuckDB oracle keeps the
    // definitional distinct-value-histogram form (min v: 5·cum(v) ≥ k·n)
    // — an independent formulation of the same order statistic, so the
    // hash gate checks the ladder against the textbook definition.
    "ev_rfm" -> ((s, dir) => {
      val users = load(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("d"),
          graft.Exact.dec(col("value")).as("v"))
        .groupBy("user_id")
        .agg(max("d").as("rec"), count(lit(1)).as("freq"),
          (sum("v") * 100).cast("long").as("mon"))
        .localCheckpoint()
      val nU = users.count()
      def thresholds(metric: String): DataFrame = {
        import s.implicits._
        // t_k = order statistic at rank r = ⌈k·n/5⌉ (≡ min v with
        // 5·cum(v) ≥ k·n, the oracle's definitional form), via the
        // shared bucket-then-refine ladder.
        val tgt = (1 to 4).map(k => (k.toLong, (k.toLong * nU + 4L) / 5L))
          .toDF("k", "r")
        val ts = (1 to 4).map(k =>
          min(when(col("k") === k, col("value"))).as(s"${metric}_t$k"))
        graft.plans.QuantileLadder
          .orderStats(users.select(col(metric)), metric, tgt)
          .groupBy().agg(ts.head, ts.tail: _*)
      }
      def score(metric: String): org.apache.spark.sql.Column =
        (1 to 4).map(k =>
          (col(metric) > col(s"${metric}_t$k")).cast("long"))
          .reduce(_ + _) + 1
      users
        .crossJoin(broadcast(thresholds("rec")))
        .crossJoin(broadcast(thresholds("freq")))
        .crossJoin(broadcast(thresholds("mon")))
        .select(col("user_id"), col("rec").as("last_day"),
          col("freq").as("frequency"),
          (col("mon").cast("double") / 100.0).as("monetary"),
          score("rec").as("r_score"), score("freq").as("f_score"),
          score("mon").as("m_score"),
          (score("rec") * 100 + score("freq") * 10 + score("mon")).as("rfm"))
        .orderBy("user_id")
    }),

    // Cohort LTV curves — the revenue-weighted companion of ev_retention
    // (the table under every "payback period" decision): users cohort by
    // first-active epoch week, revenue accrues per (user, week) in exact
    // integer cents, and each cohort's curve is cumulative revenue (and
    // revenue per cohort user) by age. Scale shape: ONE (user, week)
    // keyed agg; the cohort-week window is user-keyed (data-scale key);
    // the curve agg and its per-cohort cumulative window ride the
    // cohorts×ages frame above aggregates; cohort sizes come back as a
    // broadcast. All integer until the three final /100 divisions,
    // round(6).
    "ev_ltv" -> ((s, dir) => {
      val uw = load(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("w"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("user_id", "w").agg(sum("c").as("wc"))
      val aged = uw
        .withColumn("cw", min("w").over(Window.partitionBy("user_id")))
        .withColumn("age", col("w") - col("cw"))
        .localCheckpoint() // feeds the curve agg AND the cohort-size agg
      val curve = aged.groupBy("cw", "age")
        .agg(sum("wc").as("rev_c"), count(lit(1)).as("active_users"))
      val sizes = aged.where(col("age") === 0)
        .groupBy("cw").agg(count(lit(1)).as("cohort_users"))
      val wAge = Window.partitionBy("cw").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
      curve.join(broadcast(sizes), "cw")
        .withColumn("cum_c", sum("rev_c").over(wAge))
        .select(
          to_date(timestamp_micros(col("cw") * 604800000000L)).as("week_start"),
          col("age").as("age_week"), col("cohort_users"), col("active_users"),
          round(col("rev_c").cast("double") / 100.0, 6).as("rev"),
          round(col("cum_c").cast("double") / 100.0, 6).as("cum_rev"),
          round(col("cum_c").cast("double") / 100.0 / col("cohort_users"), 6)
            .as("cum_rev_per_user"))
        .orderBy("week_start", "age_week")
    }),

    // Kaplan–Meier survival over user activity lifetimes — the estimator
    // behind every churn/"retention half-life" curve, with CENSORING
    // done right (the naive mean-lifetime number silently treats
    // still-active users as churned): duration = last−first active day;
    // users last seen within KmCensorDays of the corpus horizon are
    // right-censored, everyone else is an observed churn. S(t) =
    // Π_{t'≤t} (n_risk−deaths)/n_risk over the DURATION HISTOGRAM.
    // Exactness: deaths/censored/n_risk are integer counts; each factor
    // and the left-fold product are identical double expressions on both
    // engines (the a24 ordered-fold discipline), round(6) at the end.
    // The running products come from ONE carried fold over the factor
    // array (p_i = p_{i-1} * f_i — the same association order the
    // DuckDB per-row PRODUCT fold uses, so doubles stay bit-identical),
    // not a per-row slice+fold, which would be O(T²) in slice work.
    // Scale: ONE user-keyed agg; the histogram, its desc-cum risk
    // window, and the prefix-product explode all ride the day-span-scale
    // duration frame above aggregates — nothing scales with users.
    "ev_kaplan_meier" -> ((s, dir) => {
      val users = load(s, dir, "events")
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
        .groupBy("user_id").agg(min("d").as("f"), max("d").as("l"))
      val hz = users.groupBy().agg(max("l").as("h"))
      val lab = users.crossJoin(broadcast(hz))
        .select((col("l") - col("f")).as("dur"),
          (col("l") <= col("h") - KmCensorDays).cast("long").as("died"))
      val hist = lab.groupBy("dur")
        .agg(sum("died").as("deaths"),
          (count(lit(1)) - sum("died")).as("censored"))
      val wR = Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val risk = hist.withColumn("n_risk",
        sum(col("deaths") + col("censored")).over(wR))
      val factors = transform(col("arr"), x =>
        (x.getField("n_risk") - x.getField("deaths")).cast("double") /
          x.getField("n_risk").cast("double"))
      // Running products in ONE carried fold: acc = (product so far,
      // prefix-product array); p_i = p_{i-1} * f_i is the same
      // association order as a per-row left fold over factors[0..i],
      // so the doubles are bit-identical to the slice form it replaces.
      val prefix = aggregate(factors,
        struct(lit(1.0).as("p"), array().cast("array<double>").as("ps")),
        (acc, x) => struct((acc.getField("p") * x).as("p"),
          concat(acc.getField("ps"), array(acc.getField("p") * x)).as("ps")),
        acc => acc.getField("ps"))
      risk.groupBy()
        .agg(array_sort(collect_list(struct(
          col("dur"), col("deaths"), col("censored"), col("n_risk")))).as("arr"))
        .select(posexplode(arrays_zip(col("arr"), prefix.as("surv")))
          .as(Seq("i", "z")))
        .select(col("z.arr.dur").as("duration_days"),
          col("z.arr.n_risk").as("n_risk"),
          col("z.arr.deaths").as("deaths"),
          col("z.arr.censored").as("censored"),
          round(col("z.surv"), 6).as("survival"))
        .orderBy("duration_days")
    }),

    // Decile lift/gains table — the model-evaluation summary behind
    // every targeting decision ("is activity a useful purchase
    // predictor?"): score users by event frequency, cut into ten
    // quantile deciles, and report each decile's conversion rate, lift
    // over the base rate, and cumulative capture reading from the top
    // decile down (the gains curve). Decile boundaries are exact order
    // statistics at ranks ⌈j·n/10⌉ from the shared QuantileLadder — no
    // user-scale rank window, no ntile over the population; decile
    // assignment is 9 broadcast integer compares. Lift and capture are
    // integer-ratio double expressions over the 10-row decile histogram
    // (+ its desc-cumulative window), round(6).
    "ev_decile_lift" -> ((s, dir) => {
      import s.implicits._
      val users = load(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("freq"),
          max((col("event_type") === "purchase").cast("long")).as("conv"))
        .localCheckpoint()
      val nU = users.count()
      val tgt = (1 to 9).map(j => (j.toLong, (j.toLong * nU + 9L) / 10L))
        .toDF("k", "r")
      val ts = (1 to 9).map(j =>
        min(when(col("k") === j, col("value"))).as(s"t$j"))
      val thr = graft.plans.QuantileLadder
        .orderStats(users.select(col("freq")), "freq", tgt)
        .groupBy().agg(ts.head, ts.tail: _*)
      val decile = (1 to 9).map(j =>
        (col("freq") > col(s"t$j")).cast("long")).reduce(_ + _) + 1
      val hist = users.crossJoin(broadcast(thr))
        .select(col("user_id"), col("conv"), decile.as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
        .localCheckpoint()
      val tot = hist.groupBy()
        .agg(sum("n_users").as("tu"), sum("n_conv").as("tc"))
      val wTop = Window.orderBy(col("decile").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      hist.crossJoin(broadcast(tot))
        .withColumn("cum_conv", sum("n_conv").over(wTop))
        .select(col("decile"), col("n_users"), col("n_conv"),
          round(col("n_conv").cast("double") / col("n_users"), 6).as("rate"),
          round(col("n_conv").cast("double") / col("n_users") /
            (col("tc").cast("double") / col("tu")), 6).as("lift"),
          round(col("cum_conv").cast("double") / col("tc"), 6)
            .as("cum_capture"))
        .orderBy(col("decile").desc)
    }),

    "ev_retention" -> ((s, dir) => {
      val counts = load(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .groupBy("user_id")
        .agg(min(col("day")).as("d0"), collect_set(col("day")).as("days"))
        .select(col("d0").as("cohort_day"),
          explode(col("days")).as("day"))
        .select(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
        .where(col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset").agg(count(lit(1)).as("users"))
      val base = counts.where(col("day_offset") === 0)
        .select(col("cohort_day"), col("users").as("n0"))
      counts.join(broadcast(base), "cohort_day")
        .select(col("cohort_day"), col("day_offset"), col("users"),
          round(col("users").cast("double") / col("n0"), 6).as("retention"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Last-touch attribution: for every purchase, the most recent click by
    // the same user strictly before it, if within 7 days (the batch twin of
    // the streaming interval join StatefulOps.attributeClicks — same
    // semantics, oracle-checkable). No join at all: one per-user window in
    // event-time order carries the running last-click timestamp (frame ends
    // at 1 PRECEDING, so a click never attributes to itself); purchases
    // filter and test the 7-day bound map-side. At 100 TB this is one keyed
    // shuffle over the click/purchase subset — the join-free form of the
    // classic ad-attribution query.
    "ev_attribution" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      load(s, dir, "events")
        .where(col("event_type").isin("click", "purchase"))
        .withColumn("last_click",
          max(when(col("event_type") === "click", col("ts"))).over(w))
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts").as("purchase_ts"),
          when(col("last_click") >= col("ts") - expr("INTERVAL 7 DAYS"),
            col("last_click")).as("attributed_click_ts"))
        .orderBy("user_id", "event_id")
    }),

    // Weekly cohort retention: cohort = ISO week of a user's first event;
    // `users` = distinct users from that cohort active k weeks later.
    // ONE user-keyed aggregate computes both the cohort week (min of the
    // truncated week — date_trunc is monotone, so min·trunc = trunc·min)
    // and the user's distinct active-week set (collect_set dedups in the
    // map-side partial, and its size is bounded by CALENDAR WEEKS, not by
    // the user's event count — a decade is ≤522 entries). Exploding the
    // set yields exactly one row per (user, act_week), so the per-cohort
    // count is a plain count — no join, no count_distinct Expand: the
    // round-8 formulation's separate cohort/active legs shuffled events
    // twice on different keys (user_id vs (user_id, week)), which
    // ReuseExchange can never merge. Week arithmetic stays integral (both
    // sides truncate to Monday 00:00, so the day diff is an exact
    // multiple of 7) — no double rounding to drift between engines.
    "ev_cohort" -> ((s, dir) =>
      load(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        .groupBy("user_id")
        .agg(min(col("w")).as("cohort_week"), collect_set(col("w")).as("act_weeks"))
        .select(col("cohort_week"), explode(col("act_weeks")).as("act_week"))
        .select(col("cohort_week"),
          expr("datediff(act_week, cohort_week) div 7").cast("long").as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("users"))
        .orderBy("cohort_week", "week_offset")),

    // Two-proportion z-test over a deterministic 50/50 hash split — the
    // experimentation-analytics primitive. Assignment is content-stable
    // (md5-prefix hash of user_id: same variant on any engine, any run —
    // the split_assign rule). "Conversion" is scale-adaptive so the metric
    // is non-degenerate at every SF: a user converts when their purchase
    // count is at least the corpus per-user average, compared by exact
    // integer cross-multiplication (cnt · n_users >= total_purchases) —
    // no float threshold to drift. The whole test reduces to ONE
    // user-keyed shuffle + a one-row broadcast of the corpus totals + a
    // one-row global agg: at 100 TB the z-score costs no more than a
    // distinct-user count. The z arithmetic runs on exact integer counts
    // with an identical double expression tree both engines (sqrt only),
    // round(6) guard.
    // Time-weighted average value per event type (the TWAP shape): each
    // event's value holds until the user's next event, so it is weighted
    // by that interval. One per-user lead window (keyed — never global)
    // + one keyed rollup. Exactness: value→integer cents, duration→
    // integer µs; the per-row product is computed in decimal(38,0)
    // (DuckDB: HUGEINT), never in 64-bit — a months-long gap times a
    // large value would overflow a long, where Spark (non-ANSI) wraps
    // silently — and accumulates exactly on any partitioning; only the
    // final ratio is double+round(6).
    "ev_twa" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cents = round(col("value") * 100).cast("long")
      load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
          cents.as("v"))
        .withColumn("dur",
          lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
        .where(col("dur").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("v").cast("decimal(38,0)") * col("dur")).as("sp"),
          sum(col("dur").cast("decimal(38,0)")).as("sd"))
        .select(col("event_type"), col("n_intervals"),
          round(col("sp").cast("double") / col("sd").cast("double") / 100.0, 6)
            .as("twa_value"))
        .orderBy("event_type")
    }),

    // Difference-in-differences estimator — the quasi-experimental
    // effect measure when you can't randomize at event time: treatment
    // group = the ev_ab_test hash split (content-derived, RNG-free),
    // periods = first/second half of the corpus span (one-row
    // broadcast midpoint). DiD = (m_t2 − m_t1) − (m_c2 − m_c1) over
    // the four cell means. Exactness: cell sums are exact integer
    // cents (decimal/HUGEINT), cells pivot via min-over-case (never
    // order-sensitive first()), and the means/DiD are identical double
    // expressions, round(6). Scale: ONE corpus (group, period) agg; the
    // pivot rides the 4-row cell frame.
    "ev_did" -> ((s, dir) => {
      val ev = load(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      val mid = ev.groupBy().agg(expr("(min(us) + max(us)) div 2").as("mid"))
      val cells = ev.crossJoin(broadcast(mid))
        .select(
          (graft.Exact.hash32(col("user_id").cast("string")) % 2 === 0)
            .cast("long").as("treat"),
          (col("us") >= col("mid")).cast("long").as("p2"), col("c"))
        .groupBy("treat", "p2")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
      def cell(t: Int, p: Int, c: String) =
        min(when(col("treat") === t && col("p2") === p, col(c)))
      val m = (t: Int, p: Int) =>
        col(s"sc_$t$p").cast("double") / col(s"n_$t$p") / 100.0
      cells.groupBy().agg(
          cell(1, 0, "n").as("n_10"), cell(1, 1, "n").as("n_11"),
          cell(0, 0, "n").as("n_00"), cell(0, 1, "n").as("n_01"),
          cell(1, 0, "sc").as("sc_10"), cell(1, 1, "sc").as("sc_11"),
          cell(0, 0, "sc").as("sc_00"), cell(0, 1, "sc").as("sc_01"))
        .select(
          col("n_10").as("n_treat_pre"), col("n_11").as("n_treat_post"),
          col("n_00").as("n_ctrl_pre"), col("n_01").as("n_ctrl_post"),
          round(m(1, 0), 6).as("mean_treat_pre"),
          round(m(1, 1), 6).as("mean_treat_post"),
          round(m(0, 0), 6).as("mean_ctrl_pre"),
          round(m(0, 1), 6).as("mean_ctrl_post"),
          round((m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0)), 6).as("did"))
    }),

    // Time-to-convert quantiles — the latency distribution of the
    // signup→purchase funnel edge (p25/p50/p75/p90 of seconds between a
    // user's first signup and their first LATER purchase), the number
    // under "how long until activation". Pairing is the ev_funnel greedy
    // chain (user-keyed window carries first-signup; purchases after it
    // aggregate to the first conversion); the quantiles are exact order
    // statistics from the shared QuantileLadder — converter counts can
    // reach user scale, so no population rank window. All-integer until
    // none: seconds are integer, ranks are integer, output is integer.
    "ev_ttc_quantiles" -> ((s, dir) => {
      import s.implicits._
      val ev = load(s, dir, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id")
      val conv = ev
        .withColumn("s",
          min(when(col("event_type") === "signup", col("us"))).over(w))
        .where(col("event_type") === "purchase" && col("s").isNotNull &&
          col("us") > col("s"))
        .groupBy("user_id").agg(min("us").as("p"), min("s").as("s"))
        .select(expr("(p - s) div 1000000").as("dt"))
        .localCheckpoint()
      val n = conv.count()
      val tgt = Seq(25L, 50L, 75L, 90L).map(p => (p, (p * n + 99L) / 100L))
        .toDF("k", "r")
      graft.plans.QuantileLadder.orderStats(conv, "dt", tgt)
        .select(col("k").as("pctile"), col("r").as("rank"),
          col("value").as("ttc_s"), lit(n).as("n_converters"))
        .orderBy("pctile")
    }),

    // Per-user behavioral entropy — the "diversity of behavior" feature
    // (H = ln n − Σ m·ln m / n over the user's event-type mix): bots and
    // single-purpose accounts sit near 0, organic users spread. One
    // corpus (user, type) agg + one user agg; the m·ln m sum folds in
    // type order (the ta_entropy parity template), round(6). Both
    // shuffles key on user_id — data-scale keys, embarrassingly
    // parallel.
    "ev_user_entropy" -> ((s, dir) => {
      val m = load(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("m"))
      val sMlnM = aggregate(
        transform(array_sort(collect_list(struct(col("event_type"), col("m")))),
          x => x.getField("m").cast("double") *
            log(x.getField("m").cast("double"))),
        lit(0.0), (acc, x) => acc + x)
      m.groupBy("user_id")
        .agg(sum("m").as("n_events"), count(lit(1)).as("n_types"),
          sMlnM.as("s"))
        .select(col("user_id"), col("n_events"), col("n_types"),
          round(log(col("n_events")) - col("s") / col("n_events"), 6)
            .as("entropy"))
        .orderBy("user_id")
    }),

    // Two-period Poisson rate comparison per event type — "did the
    // error rate change between the first and second half of the
    // window", the conditional (binomial) exact-form z-test every
    // incident review runs: the type's [min, max] day span splits at
    // mid = floor((min_d + max_d + 1) / 2) (pure integer FLOOR division
    // matching DuckDB's `//`, so both engines cut identically even for
    // negative pre-epoch days), exposures t1/t2 are day counts,
    // and under H0 the first-half count n1 ~ Binomial(N, t1/(t1+t2))
    // conditional on N = n1+n2, giving z = (n1 − N·p0)/√(N·p0·(1−p0)).
    // Everything is integer until p0 and the one z expression, round(6);
    // NULL when a type has a single-day span or an empty half (σ = 0).
    // Scale: ONE keyed agg over the fact table; the split and test ride
    // the types-sized frame.
    "ev_rate_test" -> ((s, dir) =>
      rateZ(s, dir)
        .select(col("event_type"), col("n1"), col("n2"),
          (col("mid") - col("mn")).as("days_1"),
          (col("mx") - col("mid") + 1).as("days_2"),
          round(col("z0"), 6).as("z"))
        .orderBy("event_type")),

    // Benjamini–Hochberg FDR correction over the per-type rate-test
    // p-values — the multiple-testing control a pipeline that z-tests
    // THOUSANDS of metric families per day (every `a*`/`ev_*` test here,
    // times every segment) cannot ship without: at α=0.05, fifty true
    // nulls yield ~2.5 false "regressions" per day uncorrected. Two-sided
    // p = erfc(|z|/√2) via the Abramowitz–Stegun 7.1.26 rational
    // approximation (|ε| ≤ 1.5·10⁻⁷ — far inside round(6); the SAME
    // Horner tree evaluates on both engines, the a25_spearman discipline
    // for transcendental parity). BH: rank p ascending (ties broken by
    // type so both engines agree), p_bh(i) = min_{j≥i} p(j)·m/j clamped
    // at 1 — both the rank and the suffix-min run as broadcast self-joins
    // on the TYPES-scale frame, not windows, so nothing here ever sees an
    // unpartitioned fact-scale exchange. Types whose span admits no test
    // (single-day: z NULL) pass through with NULL p/p_bh/reject. Scale:
    // one corpus-scale keyed agg (inside rateZ); everything after is
    // types² ≤ a few hundred broadcast-joined rows.
    "a33_bh_fdr" -> ((s, dir) => {
      val g = rateZ(s, dir).select(col("event_type"), col("z0"))
        .localCheckpoint() // reused by scored + the final left join
      val x = abs(col("z0")) / sqrt(lit(2.0))
      val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
      val p = (((((lit(1.061405429) * t + lit(-1.453152027)) * t +
        lit(1.421413741)) * t + lit(-0.284496736)) * t +
        lit(0.254829592)) * t) * exp(x * x * lit(-1.0))
      val scored = g.where(col("z0").isNotNull)
        .select(col("event_type"), p.as("p"))
        .localCheckpoint() // ranked via two broadcast self-joins below
      val m = scored.agg(count(lit(1)).as("m"))
      val b = scored.select(col("event_type").as("tb"), col("p").as("pb"))
      val ranked = scored.join(broadcast(b),
          col("pb") < col("p") ||
            (col("pb") === col("p") && col("tb") <= col("event_type")))
        .groupBy("event_type", "p").agg(count(lit(1)).as("r"))
      val rb = ranked.select(col("event_type").as("tb"), col("p").as("pb"),
        col("r").as("rb"))
      val adj = ranked.join(broadcast(rb),
          col("pb") > col("p") ||
            (col("pb") === col("p") && col("tb") >= col("event_type")))
        .crossJoin(broadcast(m))
        .groupBy("event_type", "p")
        .agg(min(col("pb") * col("m").cast("double") /
          col("rb").cast("double")).as("p_raw"))
        .select(col("event_type"), col("p"),
          least(col("p_raw"), lit(1.0)).as("p_bh"))
      g.join(adj, Seq("event_type"), "left")
        .select(col("event_type"), round(col("z0"), 6).as("z"),
          round(col("p"), 6).as("p"), round(col("p_bh"), 6).as("p_bh"),
          when(col("p_bh").isNotNull, col("p_bh") <= lit(0.05)).as("reject"))
        .orderBy("event_type")
    }),

    // Per-type Gini concentration of user activity — "is one bot
    // account generating all the clicks", the inequality twin of
    // ev_user_entropy's diversity view. Exact via the a16_gini
    // tied-block histogram form, one level up: the fact table reduces
    // to (type, user) counts, those collapse to a (type, count)
    // HISTOGRAM (≤ |types|·|distinct counts| rows), the cumulative-rank
    // window runs over histogram-scale rows only, and the tied-block
    // rank sum Σ c·m·(2·r0 + m − 1) folds in decimal/HUGEINT so any
    // partitioning agrees bit-for-bit. G = (t2 − (n+1)·s)/(n·s) is the
    // one final double, round(6). Scale: two keyed aggs + a
    // metadata-frame window — the a16 shape exactly; no per-user sort.
    "ev_user_gini" -> ((s, dir) => {
      val uc = load(s, dir, "events")
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
      val grp = uc.groupBy("event_type", "c").agg(count(lit(1)).as("m"))
      val wCum = Window.partitionBy("event_type").orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
      grp
        .withColumn("r0", coalesce(sum(col("m")).over(wCum), lit(0L)) + 1)
        .groupBy("event_type")
        .agg(sum(col("m")).as("n_users"),
          sum(col("c").cast("decimal(38,0)") * col("m")).as("s"),
          sum(col("c").cast("decimal(38,0)") * col("m") *
            (lit(2) * col("r0") + col("m") - 1)).as("t2"))
        .select(col("event_type"), col("n_users"),
          round((col("t2").cast("double") -
              (col("n_users") + 1).cast("double") * col("s").cast("double")) /
            (col("n_users").cast("double") * col("s").cast("double")), 6)
            .as("gini"))
        .orderBy("event_type")
    }),

    // Poisson bootstrap CI for the per-type mean value (Chamandy et al.
    // 2012, "Estimating Uncertainty for Massive Data Streams" — THE
    // resampling scheme that distributes: instead of drawing n rows with
    // replacement (a global operation), each row independently carries a
    // Poisson(1) weight per resample, so the whole bootstrap is one
    // map pass + a (type, b) partial-aggregating shuffle of B·types tiny
    // keys; the ×B work is map-side CPU, never data movement). Fully
    // deterministic and hence oracle-checkable: the per-(row, b) uniform
    // is a multiplicative mix of the house md5 hash by a per-resample
    // multiplier — u = (h · ((b·2654435761) % M + 1)) % M, normalized,
    // with M = 2³¹−1 (products ≤ 4.7e18, int64-safe). The multiplier
    // must VARY nonlinearly with b: the first-cut additive form
    // u_b = ((h+b)·48271) % M made consecutive resamples lattice shifts
    // of each other by 48271/M ≈ 2e-5 — 200 near-identical weightings
    // whose shared accidental corr(w, value) put the sample mean 10σ
    // outside its own CI (caught by the containment spec, fixed by
    // per-b multipliers; boot_se now matches the σ/√n theory) —
    // pushed through the Poisson(1) inverse CDF as a shared-literal
    // branch table (exact double compares, identical on both engines;
    // weights capped at 6, P(X>6) ≈ 8e-5). Resample means are exact
    // integer-cents ratios; the percentile bracket is nearest-rank
    // ceil(q·B) over the sorted 200 means (both engines index the same
    // sorted list); the boot-SE folds over the SAME sorted array (the
    // ir_mrr ordered-reduction discipline).
    "ev_bootstrap_ci" -> ((s, dir) => {
      val B = 200
      val base = load(s, dir, "events")
        .select(col("event_type"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"),
          (graft.Exact.hash32(col("event_id").cast("string")) %
            2147483647L).as("h"))
        .localCheckpoint()
      val pt = base.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("c").as("sc"))
      val u = (expr("(h * ((b * 2654435761) % 2147483647 + 1)) % 2147483647")
        .cast("double") + lit(0.5)) / lit(2147483647.0)
      val w = when(u < 0.36787944117144233, 0L)
        .when(u < 0.7357588823428847, 1L)
        .when(u < 0.9196986029286058, 2L)
        .when(u < 0.9810118431238463, 3L)
        .when(u < 0.9963401531726563, 4L)
        .when(u < 0.9994058151824183, 5L)
        .otherwise(6L)
      val res = base
        .select(col("event_type"), col("c"), col("h"),
          explode(sequence(lit(0L), lit(B - 1L))).as("b"))
        .select(col("event_type"), col("b"), col("c"), w.as("w"))
        .groupBy("event_type", "b")
        .agg(sum("w").as("sw"), sum(col("w") * col("c")).as("swx"))
        .select(col("event_type"),
          when(col("sw") > 0,
            col("swx").cast("double") / (lit(100.0) * col("sw").cast("double")))
            .otherwise(lit(0.0)).as("mb"))
        .groupBy("event_type")
        .agg(sort_array(collect_list(col("mb"))).as("arr"))
      val mbar = aggregate(col("arr"), lit(0.0), (a, x) => a + x) / lit(B.toDouble)
      res.join(broadcast(pt), "event_type")
        .select(col("event_type"), col("n"),
          round(col("sc").cast("double") /
            (lit(100.0) * col("n").cast("double")), 6).as("mean_val"),
          round(element_at(col("arr"), 5), 6).as("ci_lo"),
          round(element_at(col("arr"), 195), 6).as("ci_hi"),
          round(sqrt(aggregate(col("arr"), lit(0.0),
            (a, x) => a + (x - mbar) * (x - mbar)) / lit((B - 1).toDouble)), 6)
            .as("boot_se"))
        .orderBy("event_type")
    }),

    "ev_ab_test" -> ((s, dir) => {
      val perUser = load(s, dir, "events")
        .groupBy("user_id")
        .agg(sum((col("event_type") === "purchase").cast("long")).as("pc"))
      val tot = perUser.groupBy()
        .agg(count(lit(1)).as("nu"), sum(col("pc")).as("tp"))
      val users = perUser.crossJoin(broadcast(tot))
        .select(col("user_id"),
          (col("pc") * col("nu") >= col("tp")).cast("int").as("conv"),
          (graft.Exact.hash32(col("user_id").cast("string")) % 2 === 0).as("va"))
      // nullif guards: an empty variant must yield NULL on BOTH engines
      // (Spark integer-division-by-zero is NULL but DuckDB float division
      // diverges — nullif makes the expression identical everywhere).
      val na = expr("nullif(n_a, 0)")
      val nb = expr("nullif(n_b, 0)")
      val p = (col("c_a") + col("c_b")) / expr("nullif(n_a + n_b, 0)")
      users.groupBy().agg(
          sum(when(col("va"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("va"), 1L).otherwise(0L)).as("n_b"),
          sum(when(col("va"), col("conv").cast("long")).otherwise(0L)).as("c_a"),
          sum(when(!col("va"), col("conv").cast("long")).otherwise(0L)).as("c_b"))
        .select(col("n_a"), col("n_b"), col("c_a"), col("c_b"),
          round(col("c_a") / na, 6).as("rate_a"),
          round(col("c_b") / nb, 6).as("rate_b"),
          round((col("c_a") / na - col("c_b") / nb) /
            sqrt(p * (lit(1.0) - p) *
              (lit(1.0) / na + lit(1.0) / nb)), 6).as("z_score"))
    }),

    // Exact single-split binary segmentation per event type — the first
    // level of the classic changepoint recursion (Scott & Knott 1974):
    // over the calendar zero-filled daily count series, pick the split
    // that minimizes SSE(left) + SSE(right). Where ev_cusum_cp/
    // ev_page_hinkley DETECT drift sequentially, this finds the
    // retrospective least-squares break. O(D) per type, not O(D²): both
    // segment SSEs come from running prefix sums — SSE(1..k) =
    // S2_k − S1_k²/k — so each candidate split is one expression over
    // the cumulative window. Counts and prefix sums stay integer
    // (Σc² in decimal(38,0)); cost doubles share one expression tree
    // cross-engine, the argmin tie-breaks on earliest day, round(6).
    // Scale: one corpus-scale (type, day) agg; the spine, window, and
    // argmin ride the types×days frame partitioned by type. Types with a
    // single spine day have no candidate split and emit no row.
    //
    // Streaming-twin adjudication: retrospective by definition — every
    // candidate is scored against the FULL series' suffix sums, so no
    // causal processor can emit before the stream closes (the
    // ev_cusum_cp class).
    "ev_binseg" -> ((s, dir) => {
      val daily = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"))
        .groupBy("event_type", "d").agg(count(lit(1)).as("c"))
      val rng = daily.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
      val spine = rng.select(col("event_type"),
        explode(sequence(col("mn"), col("mx"))).as("d"))
      val full = spine.join(daily, Seq("event_type", "d"), "left")
        .select(col("event_type"), col("d"),
          coalesce(col("c"), lit(0L)).as("c"))
      val wOrd = Window.partitionBy("event_type").orderBy("d")
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pre = full
        .withColumn("k", row_number().over(wOrd).cast("long"))
        .withColumn("s1", sum("c").over(wCum))
        .withColumn("s2",
          sum(col("c").cast("decimal(38,0)") * col("c")).over(wCum))
      val tot = full.groupBy("event_type")
        .agg(count(lit(1)).as("dd"), sum("c").as("t1"),
          sum(col("c").cast("decimal(38,0)") * col("c")).as("t2"))
      val cost =
        (col("s2").cast("double") - col("s1").cast("double") *
          col("s1").cast("double") / col("k").cast("double")) +
        ((col("t2") - col("s2")).cast("double") -
          (col("t1") - col("s1")).cast("double") *
            (col("t1") - col("s1")).cast("double") /
            (col("dd") - col("k")).cast("double"))
      val cost0 = col("t2").cast("double") - col("t1").cast("double") *
        col("t1").cast("double") / col("dd").cast("double")
      val cand = pre.join(broadcast(tot), "event_type")
        .where(col("k") < col("dd"))
        .select(col("event_type"), col("d"), col("k"), col("dd"),
          cost.as("cost"), cost0.as("cost0"))
      val wPick = Window.partitionBy("event_type")
        .orderBy(col("cost"), col("d"))
      cand.withColumn("rn", row_number().over(wPick))
        .where(col("rn") === 1)
        .select(col("event_type"), col("d").as("split_day"),
          col("k").as("n_left"), (col("dd") - col("k")).as("n_right"),
          round(col("cost"), 6).as("sse_split"),
          round(col("cost0") - col("cost"), 6).as("gain"))
        .orderBy("event_type")
    }),

    // Causal-impact readout per event type — "did the launch move
    // revenue, and by how much beyond the noise": the Brodersen-style
    // counterfactual reduced to its deterministic core. Pre-period =
    // days before the fixed 2024-01-16 pivot (the prof_drift /
    // prof_psi_value split); the counterfactual for each post day is the
    // pre-period SAME-WEEKDAY mean of daily revenue (integer-cents sums
    // on the zero-filled spine; dow via pmod(epoch-days, 7) so both
    // engines cut weeks identically); impact = actual − expected over
    // the post window with a ±1.96·s·√n_post interval from the
    // pre-period residual variance (df = n_pre − 7, one mean per
    // weekday). `significant` = the interval excludes 0. Order-dependent
    // double sums (expected, residual²) fold in day order (the
    // prof_mutual_info parity template), round(6); CI NULL when
    // n_pre ≤ 7. Post days LEFT-join the pre-means: a type whose
    // pre-period spans fewer than 7 distinct weekdays keeps its true
    // n_post/actual_post, and the counterfactual readout (expected/
    // impact/CI/significant) is NULLed via an explicit missing-dow
    // count rather than silently dropping those post days (an inner
    // join here under-counted n_post on short pre-periods — round-14
    // ADVICE). Types with no pre-period emit no row. Scale: one
    // corpus-scale (type, day) agg; the dow-mean frame is types×7
    // broadcast; folds ride types×days frames.
    "ev_impact" -> ((s, dir) => {
      val pivot = lit("2024-01-16").cast("date")
      val d = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("sc"))
        .localCheckpoint() // spine + pre-means + both folds ride it
      val spine = d.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
        .select(col("event_type"),
          explode(sequence(col("mn"), col("mx"))).as("d"))
      val f = spine.join(d, Seq("event_type", "d"), "left")
        .na.fill(0L, Seq("sc"))
        .withColumn("dow",
          pmod(datediff(col("d"), lit("1970-01-01").cast("date")), lit(7)))
      val pre = f.where(col("d") < pivot)
      val m = pre.groupBy("event_type", "dow")
        .agg((sum("sc").cast("double") / count(lit(1)).cast("double"))
          .as("mhat"))
      def foldD(term: org.apache.spark.sql.Column) =
        aggregate(transform(array_sort(collect_list(
          struct(col("d"), term.as("t")))),
          x => x.getField("t")), lit(0.0), (a, t) => a + t)
      val preR = pre.join(broadcast(m), Seq("event_type", "dow"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pre"),
          foldD((col("sc").cast("double") - col("mhat")) *
            (col("sc").cast("double") - col("mhat"))).as("rss"))
      val post = f.where(col("d") >= pivot)
        .join(broadcast(m), Seq("event_type", "dow"), "left")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_post"), sum("sc").as("act"),
          sum(when(col("mhat").isNull, lit(1L)).otherwise(lit(0L)))
            .as("n_miss"),
          foldD(coalesce(col("mhat"), lit(0.0))).as("exp0"))
      val cov = col("n_miss") === 0
      val diff = col("act").cast("double") - col("exp0")
      val hw = lit(1.96) * sqrt(col("rss") /
        (col("n_pre") - 7).cast("double") * col("n_post").cast("double"))
      preR.join(post, "event_type")
        .select(col("event_type"), col("n_pre"), col("n_post"),
          round(col("act").cast("double") / lit(100.0), 6).as("actual_post"),
          round(when(cov, col("exp0") / lit(100.0)), 6).as("expected_post"),
          round(when(cov, diff / lit(100.0)), 6).as("impact"),
          round(when(col("n_pre") > 7 && cov, (diff - hw) / lit(100.0)), 6)
            .as("ci_lo"),
          round(when(col("n_pre") > 7 && cov, (diff + hw) / lit(100.0)), 6)
            .as("ci_hi"),
          when(col("n_pre") > 7 && cov, (diff - hw > 0) || (diff + hw < 0))
            .as("significant"))
        .orderBy("event_type")
    }),

    // Wilcoxon signed-rank test per event type on week-over-week paired
    // daily revenue — "did this week's dollars shift vs the same weekday
    // last week", the PAIRED nonparametric complement to a17_mwu's
    // unpaired rank test (pairing by calendar lag-7 removes the weekday
    // seasonal that would otherwise dominate). Exactness: daily totals
    // are integer cents on the zero-filled spine, so each pair's diff is
    // integer; zero diffs drop (the standard Wilcoxon reduction); ranks
    // of |diff| use midranks kept in HALF units h = 2·rank_min + t − 1
    // (integer — no .5 doubles until output) via one rank window + one
    // tie-count window, both partitioned by type. W⁺ = Σh/2 over
    // positive diffs; z uses the normal approximation with the exact
    // tie correction Σ(t³−t)/48. The only doubles are the final
    // W/E/Var/z expressions, shared tree cross-engine, round(6). Scale:
    // one corpus-scale (type, day) agg; lag, ranks, and tie counts all
    // ride the types×days frame partitioned by type. Types whose pairs
    // all tie at zero emit no row.
    //
    // Streaming-twin adjudication: retrospective — midranks are over the
    // FULL window's |diff| distribution, so a causal processor cannot
    // rank early pairs until the stream closes (the ev_cusum_cp class).
    "ev_wilcoxon_sr" -> ((s, dir) => {
      val daily = load(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("event_type", "d").agg(sum("c").as("v"))
      val rng = daily.groupBy("event_type")
        .agg(min("d").as("mn"), max("d").as("mx"))
      val spine = rng.select(col("event_type"),
        explode(sequence(col("mn"), col("mx"))).as("d"))
      val full = spine.join(daily, Seq("event_type", "d"), "left")
        .select(col("event_type"), col("d"),
          coalesce(col("v"), lit(0L)).as("v"))
      val wLag = Window.partitionBy("event_type").orderBy("d")
      val diffs = full.withColumn("prev", lag("v", 7).over(wLag))
        .where(col("prev").isNotNull && col("v") =!= col("prev"))
        .select(col("event_type"), (col("v") - col("prev")).as("diff"),
          abs(col("v") - col("prev")).as("adiff"))
      val wRank = Window.partitionBy("event_type").orderBy("adiff")
      val wTie = Window.partitionBy("event_type", "adiff")
      val ranked = diffs
        .withColumn("rmin", rank().over(wRank).cast("long"))
        .withColumn("tcnt", count(lit(1)).over(wTie))
      val st = ranked.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(when(col("diff") > 0,
          lit(2L) * col("rmin") + col("tcnt") - 1).otherwise(lit(0L)))
          .as("w2"))
      val ties = diffs.groupBy("event_type", "adiff")
        .agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(col("t") * col("t") * col("t") - col("t")).as("ts3"))
      val nD = col("n").cast("double")
      val varW = nD * (nD + 1) * (lit(2.0) * nD + 1) / lit(24.0) -
        col("ts3").cast("double") / lit(48.0)
      st.join(broadcast(ties), "event_type")
        .select(col("event_type"), col("n").as("n_pairs"),
          round(col("w2").cast("double") / lit(2.0), 6).as("w_plus"),
          round(when(varW > 0,
            (col("w2").cast("double") / lit(2.0) - nD * (nD + 1) / lit(4.0))
              / sqrt(varW)), 6).as("z"))
        .orderBy("event_type")
    }))

  /** Shared core of ev_rate_test and a33_bh_fdr: per-type two-period
    * Poisson rate z on the type's [mn, mx] day span split at the floor
    * midpoint — columns (event_type, n1, n2, mn, mx, mid, z0) with z0
    * UNROUNDED (each consumer rounds at its own output). Floor division
    * (pmod keeps the remainder non-negative), NOT `div` (truncates toward
    * zero): the DuckDB oracle's `//` floors, and for pre-1970 timestamps
    * (negative epoch days) the two would otherwise pick different
    * midpoints and red the hash gate. z0 is NULL for a single-day span or
    * an empty window (σ = 0). Scale: ONE keyed agg over the fact table;
    * the split and test ride the types-sized frame. */
  private def rateZ(s: SparkSession, dir: String): DataFrame = {
    val d0 = load(s, dir, "events")
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("d"))
      .localCheckpoint()
    val rng = d0.groupBy("event_type")
      .agg(min("d").as("mn"), max("d").as("mx"))
      .withColumn("mid",
        expr("(mn + mx + 1 - pmod(mn + mx + 1, 2)) div 2"))
    val g = d0.join(broadcast(rng), "event_type")
      .groupBy(col("event_type"), col("mn"), col("mx"), col("mid"))
      .agg(sum((col("d") < col("mid")).cast("long")).as("n1"),
        sum((col("d") >= col("mid")).cast("long")).as("n2"))
    val t1 = (col("mid") - col("mn")).cast("double")
    val t2 = (col("mx") - col("mid") + 1).cast("double")
    val nn = (col("n1") + col("n2")).cast("double")
    val p0 = t1 / (t1 + t2)
    val z = (col("n1").cast("double") - nn * p0) /
      sqrt(nn * p0 * (lit(1.0) - p0))
    g.select(col("event_type"), col("n1"), col("n2"), col("mn"), col("mx"),
      col("mid"), when(col("mx") > col("mn") && nn > 0, z).as("z0"))
  }

  val oracle: Map[String, String] = Map(
    "ev_binseg" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx
        |        FROM daily GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(daily.c, 0) AS c
        |  FROM spine s LEFT JOIN daily
        |    ON s.event_type = daily.event_type AND s.d = daily.d),
        |pre AS (
        |  SELECT event_type, d,
        |    row_number() OVER w AS k,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1,
        |    sum(CAST(c AS HUGEINT) * c) OVER (PARTITION BY event_type
        |      ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2
        |  FROM f WINDOW w AS (PARTITION BY event_type ORDER BY d)),
        |tot AS (
        |  SELECT event_type, count(*) AS dd, sum(c) AS t1,
        |    sum(CAST(c AS HUGEINT) * c) AS t2
        |  FROM f GROUP BY 1),
        |cand AS (
        |  SELECT pre.event_type, d, k, dd,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |       / CAST(k AS DOUBLE))
        |    + (CAST(t2 - s2 AS DOUBLE)
        |       - CAST(t1 - s1 AS DOUBLE) * CAST(t1 - s1 AS DOUBLE)
        |         / CAST(dd - k AS DOUBLE)) AS cost,
        |    CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)
        |      / CAST(dd AS DOUBLE) AS cost0
        |  FROM pre JOIN tot USING (event_type) WHERE k < dd)
        |SELECT event_type, d AS split_day, CAST(k AS BIGINT) AS n_left,
        |  CAST(dd - k AS BIGINT) AS n_right,
        |  round(cost, 6) AS sse_split, round(cost0 - cost, 6) AS gain
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY event_type ORDER BY cost, d) AS rn
        |      FROM cand)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "ev_impact" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx
        |        FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(d.sc, 0) AS sc,
        |    CAST(s.d - DATE '1970-01-01' AS BIGINT) % 7 AS dow
        |  FROM spine s LEFT JOIN d
        |    ON s.event_type = d.event_type AND s.d = d.d),
        |pre AS (SELECT * FROM f WHERE d < DATE '2024-01-16'),
        |m AS (SELECT event_type, dow,
        |        CAST(sum(sc) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mhat
        |      FROM pre GROUP BY 1, 2),
        |prer AS (
        |  SELECT pre.event_type, count(*) AS n_pre,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list((CAST(sc AS DOUBLE) - mhat) * (CAST(sc AS DOUBLE) - mhat)
        |           ORDER BY d)), (a, b) -> a + b) AS rss
        |  FROM pre JOIN m USING (event_type, dow) GROUP BY 1),
        |post AS (
        |  SELECT f.event_type, count(*) AS n_post, sum(sc) AS act,
        |    sum(CASE WHEN mhat IS NULL THEN 1 ELSE 0 END) AS n_miss,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(coalesce(mhat, 0.0) ORDER BY d)), (a, b) -> a + b) AS exp0
        |  FROM f LEFT JOIN m USING (event_type, dow)
        |  WHERE d >= DATE '2024-01-16' GROUP BY 1)
        |SELECT prer.event_type, CAST(n_pre AS BIGINT) AS n_pre,
        |  CAST(n_post AS BIGINT) AS n_post,
        |  round(CAST(act AS DOUBLE) / 100.0, 6) AS actual_post,
        |  round(CASE WHEN n_miss = 0 THEN exp0 / 100.0 END, 6)
        |    AS expected_post,
        |  round(CASE WHEN n_miss = 0
        |    THEN (CAST(act AS DOUBLE) - exp0) / 100.0 END, 6) AS impact,
        |  round(CASE WHEN n_pre > 7 AND n_miss = 0
        |    THEN (CAST(act AS DOUBLE) - exp0
        |    - 1.96 * sqrt(rss / CAST(n_pre - 7 AS DOUBLE)
        |                  * CAST(n_post AS DOUBLE))) / 100.0 END, 6)
        |    AS ci_lo,
        |  round(CASE WHEN n_pre > 7 AND n_miss = 0
        |    THEN (CAST(act AS DOUBLE) - exp0
        |    + 1.96 * sqrt(rss / CAST(n_pre - 7 AS DOUBLE)
        |                  * CAST(n_post AS DOUBLE))) / 100.0 END, 6)
        |    AS ci_hi,
        |  CASE WHEN n_pre > 7 AND n_miss = 0 THEN
        |    (CAST(act AS DOUBLE) - exp0
        |     - 1.96 * sqrt(rss / CAST(n_pre - 7 AS DOUBLE)
        |                   * CAST(n_post AS DOUBLE))) > 0
        |    OR (CAST(act AS DOUBLE) - exp0
        |     + 1.96 * sqrt(rss / CAST(n_pre - 7 AS DOUBLE)
        |                   * CAST(n_post AS DOUBLE))) < 0
        |  END AS significant
        |FROM prer JOIN post USING (event_type)
        |ORDER BY prer.event_type""".stripMargin,

    "ev_wilcoxon_sr" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx
        |        FROM daily GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d,
        |    CAST(coalesce(daily.v, 0) AS BIGINT) AS v
        |  FROM spine s LEFT JOIN daily
        |    ON s.event_type = daily.event_type AND s.d = daily.d),
        |diffs AS (
        |  SELECT event_type, v - prev AS diff, abs(v - prev) AS adiff
        |  FROM (SELECT event_type, v, lag(v, 7) OVER (
        |          PARTITION BY event_type ORDER BY d) AS prev FROM f)
        |  WHERE prev IS NOT NULL AND v <> prev),
        |ranked AS (
        |  SELECT event_type, diff,
        |    CAST(rank() OVER (PARTITION BY event_type ORDER BY adiff)
        |      AS BIGINT) AS rmin,
        |    count(*) OVER (PARTITION BY event_type, adiff) AS tcnt
        |  FROM diffs),
        |st AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CASE WHEN diff > 0 THEN 2 * rmin + tcnt - 1 ELSE 0 END) AS w2
        |  FROM ranked GROUP BY 1),
        |ties AS (
        |  SELECT event_type, sum(t * t * t - t) AS ts3
        |  FROM (SELECT event_type, adiff, count(*) AS t
        |        FROM diffs GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT st.event_type, CAST(n AS BIGINT) AS n_pairs,
        |  round(CAST(w2 AS DOUBLE) / 2.0, 6) AS w_plus,
        |  round(CASE WHEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
        |      * (2.0 * CAST(n AS DOUBLE) + 1) / 24.0
        |      - CAST(ts3 AS DOUBLE) / 48.0 > 0 THEN
        |    (CAST(w2 AS DOUBLE) / 2.0
        |       - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 4.0)
        |    / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
        |        * (2.0 * CAST(n AS DOUBLE) + 1) / 24.0
        |        - CAST(ts3 AS DOUBLE) / 48.0) END, 6) AS z
        |FROM st JOIN ties USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "ev_growth_acct" ->
      """WITH um AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 // 7 AS m
        |  FROM events),
        |c AS (
        |  SELECT user_id, m, lag(m, 1) OVER (PARTITION BY user_id ORDER BY m)
        |    AS prev
        |  FROM um),
        |bm AS (
        |  SELECT m, count(*) AS mau,
        |    CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS new_users,
        |    CAST(sum(CASE WHEN prev = m - 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS retained
        |  FROM c GROUP BY 1)
        |SELECT CAST(make_timestamp(m * 7 * 86400000000) AS DATE) AS week_start,
        |  mau AS wau, new_users, retained,
        |  mau - new_users - retained AS resurrected,
        |  CAST(coalesce(lag(mau, 1) OVER (ORDER BY m), 0) - retained AS BIGINT)
        |    AS churned
        |FROM bm ORDER BY week_start""".stripMargin,

    "ev_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events),
        |runs AS (
        |  SELECT user_id, d - row_number() OVER (PARTITION BY user_id ORDER BY d)
        |      AS grp, d
        |  FROM days),
        |r AS (
        |  SELECT user_id, grp, count(*) AS len, min(d) AS start_d, max(d) AS end_d
        |  FROM runs GROUP BY 1, 2),
        |b AS (
        |  SELECT user_id, len, start_d,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, start_d) AS rn,
        |    max(end_d) OVER (PARTITION BY user_id) AS last_d
        |  FROM r)
        |SELECT user_id, len AS longest_streak,
        |  CAST(make_timestamp(start_d * 86400000000) AS DATE) AS streak_start,
        |  CAST(make_timestamp(last_d * 86400000000) AS DATE) AS last_active_day
        |FROM b WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "ev_interarrival" ->
      """WITH e AS (
        |  SELECT event_type, ts, event_id, epoch_us(ts) AS us FROM events),
        |g AS (
        |  SELECT event_type,
        |    (us - lag(us, 1) OVER (PARTITION BY event_type
        |       ORDER BY ts, event_id)) // 1000000 AS gap_s
        |  FROM e),
        |b AS (
        |  SELECT event_type,
        |    CASE WHEN gap_s <= 0 THEN -1
        |         ELSE CAST(length(bin(gap_s)) - 1 AS BIGINT) END AS log2_bucket,
        |    gap_s
        |  FROM g WHERE gap_s IS NOT NULL)
        |SELECT event_type, log2_bucket, count(*) AS n,
        |  round(CAST(sum(gap_s) AS DOUBLE) / count(*), 6) AS mean_gap_s
        |FROM b GROUP BY 1, 2 ORDER BY event_type, log2_bucket""".stripMargin,

    "ev_did" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS us,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
         |  FROM events),
         |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
         |cells AS (
         |  SELECT CAST(${graft.Exact.hash32Sql("CAST(user_id AS VARCHAR)")}
         |           % 2 = 0 AS BIGINT) AS treat,
         |    CAST(us >= mid AS BIGINT) AS p2,
         |    count(*) AS n, CAST(sum(c) AS BIGINT) AS sc
         |  FROM e, mid GROUP BY 1, 2),
         |p AS (
         |  SELECT
         |    min(CASE WHEN treat = 1 AND p2 = 0 THEN n END) AS n_10,
         |    min(CASE WHEN treat = 1 AND p2 = 1 THEN n END) AS n_11,
         |    min(CASE WHEN treat = 0 AND p2 = 0 THEN n END) AS n_00,
         |    min(CASE WHEN treat = 0 AND p2 = 1 THEN n END) AS n_01,
         |    min(CASE WHEN treat = 1 AND p2 = 0 THEN sc END) AS sc_10,
         |    min(CASE WHEN treat = 1 AND p2 = 1 THEN sc END) AS sc_11,
         |    min(CASE WHEN treat = 0 AND p2 = 0 THEN sc END) AS sc_00,
         |    min(CASE WHEN treat = 0 AND p2 = 1 THEN sc END) AS sc_01
         |  FROM cells)
         |SELECT n_10 AS n_treat_pre, n_11 AS n_treat_post,
         |  n_00 AS n_ctrl_pre, n_01 AS n_ctrl_post,
         |  round(CAST(sc_10 AS DOUBLE) / n_10 / 100.0, 6) AS mean_treat_pre,
         |  round(CAST(sc_11 AS DOUBLE) / n_11 / 100.0, 6) AS mean_treat_post,
         |  round(CAST(sc_00 AS DOUBLE) / n_00 / 100.0, 6) AS mean_ctrl_pre,
         |  round(CAST(sc_01 AS DOUBLE) / n_01 / 100.0, 6) AS mean_ctrl_post,
         |  round((CAST(sc_11 AS DOUBLE) / n_11 / 100.0
         |         - CAST(sc_10 AS DOUBLE) / n_10 / 100.0)
         |        - (CAST(sc_01 AS DOUBLE) / n_01 / 100.0
         |           - CAST(sc_00 AS DOUBLE) / n_00 / 100.0), 6) AS did
         |FROM p""".stripMargin,

    "ev_ttc_quantiles" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |su AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN us END) AS s
        |  FROM e GROUP BY 1),
        |conv AS (
        |  SELECT e.user_id, (min(us) - min(s)) // 1000000 AS dt
        |  FROM e JOIN su USING (user_id)
        |  WHERE event_type = 'purchase' AND s IS NOT NULL AND us > s
        |  GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM conv),
        |r AS (SELECT dt, CAST(row_number() OVER (ORDER BY dt) AS BIGINT)
        |        AS rn
        |      FROM conv),
        |t AS (SELECT CAST(unnest([25, 50, 75, 90]) AS BIGINT) AS p)
        |SELECT p AS pctile, CAST((p * n + 99) // 100 AS BIGINT) AS rank,
        |  dt AS ttc_s, n AS n_converters
        |FROM t CROSS JOIN n JOIN r ON rn = (p * n + 99) // 100
        |ORDER BY pctile""".stripMargin,

    "ev_user_entropy" ->
      """WITH m AS (
        |  SELECT user_id, event_type, count(*) AS m FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT user_id, CAST(sum(m) AS BIGINT) AS n_events,
        |    CAST(count(*) AS BIGINT) AS n_types,
        |    list_sum(list(CAST(m AS DOUBLE) * ln(CAST(m AS DOUBLE))
        |      ORDER BY event_type)) AS s
        |  FROM m GROUP BY 1)
        |SELECT user_id, n_events, n_types,
        |  round(ln(n_events) - s / n_events, 6) AS entropy
        |FROM g ORDER BY user_id""".stripMargin,

    "ev_rate_test" ->
      """WITH d0 AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM events),
        |rng AS (
        |  SELECT event_type, min(d) AS mn, max(d) AS mx,
        |    (min(d) + max(d) + 1) // 2 AS mid
        |  FROM d0 GROUP BY 1),
        |g AS (
        |  SELECT d0.event_type, rng.mn, rng.mx, rng.mid,
        |    sum(CASE WHEN d < mid THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN d >= mid THEN 1 ELSE 0 END) AS n2
        |  FROM d0 JOIN rng ON d0.event_type = rng.event_type
        |  GROUP BY 1, 2, 3, 4)
        |SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  CAST(mid - mn AS BIGINT) AS days_1,
        |  CAST(mx - mid + 1 AS BIGINT) AS days_2,
        |  round(CASE WHEN mx > mn AND n1 + n2 > 0 THEN
        |    (CAST(n1 AS DOUBLE) - CAST(n1 + n2 AS DOUBLE)
        |       * (CAST(mid - mn AS DOUBLE)
        |          / (CAST(mid - mn AS DOUBLE) + CAST(mx - mid + 1 AS DOUBLE))))
        |    / sqrt(CAST(n1 + n2 AS DOUBLE)
        |       * (CAST(mid - mn AS DOUBLE)
        |          / (CAST(mid - mn AS DOUBLE) + CAST(mx - mid + 1 AS DOUBLE)))
        |       * (1.0 - CAST(mid - mn AS DOUBLE)
        |          / (CAST(mid - mn AS DOUBLE) + CAST(mx - mid + 1 AS DOUBLE))))
        |  END, 6) AS z
        |FROM g ORDER BY event_type""".stripMargin,

    "a33_bh_fdr" ->
      """WITH d0 AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
        |  FROM events),
        |rng AS (
        |  SELECT event_type, min(d) AS mn, max(d) AS mx,
        |    (min(d) + max(d) + 1) // 2 AS mid
        |  FROM d0 GROUP BY 1),
        |g AS (
        |  SELECT d0.event_type, rng.mn, rng.mx, rng.mid,
        |    sum(CASE WHEN d < mid THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN d >= mid THEN 1 ELSE 0 END) AS n2
        |  FROM d0 JOIN rng ON d0.event_type = rng.event_type
        |  GROUP BY 1, 2, 3, 4),
        |zs AS (
        |  SELECT event_type, CASE WHEN mx > mn AND n1 + n2 > 0 THEN
        |    (CAST(n1 AS DOUBLE) - CAST(n1 + n2 AS DOUBLE)
        |       * (CAST(mid - mn AS DOUBLE)
        |          / (CAST(mid - mn AS DOUBLE) + CAST(mx - mid + 1 AS DOUBLE))))
        |    / sqrt(CAST(n1 + n2 AS DOUBLE)
        |       * (CAST(mid - mn AS DOUBLE)
        |          / (CAST(mid - mn AS DOUBLE) + CAST(mx - mid + 1 AS DOUBLE)))
        |       * (1.0 - CAST(mid - mn AS DOUBLE)
        |          / (CAST(mid - mn AS DOUBLE) + CAST(mx - mid + 1 AS DOUBLE))))
        |  END AS z0
        |  FROM g),
        |scored AS (
        |  SELECT event_type,
        |    (((((1.061405429 * t + -1.453152027) * t + 1.421413741) * t
        |       + -0.284496736) * t + 0.254829592) * t)
        |    * exp(x * x * -1.0) AS p
        |  FROM (SELECT event_type, abs(z0) / sqrt(2.0) AS x,
        |          1.0 / (1.0 + 0.3275911 * (abs(z0) / sqrt(2.0))) AS t
        |        FROM zs WHERE z0 IS NOT NULL)),
        |m AS (SELECT count(*) AS m FROM scored),
        |ranked AS (
        |  SELECT a.event_type, a.p, count(*) AS r
        |  FROM scored a JOIN scored b
        |    ON b.p < a.p OR (b.p = a.p AND b.event_type <= a.event_type)
        |  GROUP BY 1, 2),
        |adj AS (
        |  SELECT a.event_type, a.p,
        |    least(min(b.p * CAST(m.m AS DOUBLE) / CAST(b.r AS DOUBLE)),
        |      1.0) AS p_bh
        |  FROM ranked a JOIN ranked b
        |    ON b.p > a.p OR (b.p = a.p AND b.event_type >= a.event_type)
        |  CROSS JOIN m
        |  GROUP BY 1, 2)
        |SELECT zs.event_type, round(z0, 6) AS z, round(adj.p, 6) AS p,
        |  round(p_bh, 6) AS p_bh,
        |  CASE WHEN p_bh IS NOT NULL THEN p_bh <= 0.05 END AS reject
        |FROM zs LEFT JOIN adj USING (event_type)
        |ORDER BY zs.event_type""".stripMargin,

    "ev_user_gini" ->
      """WITH uc AS (
        |  SELECT event_type, user_id, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, c, count(*) AS m FROM uc GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, c, m,
        |    coalesce(sum(m) OVER (PARTITION BY event_type ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS r0
        |  FROM g),
        |a AS (
        |  SELECT event_type, CAST(sum(m) AS BIGINT) AS n_users,
        |    sum(CAST(c AS HUGEINT) * m) AS s,
        |    sum(CAST(c AS HUGEINT) * m * (2 * r0 + m - 1)) AS t2
        |  FROM r GROUP BY event_type)
        |SELECT event_type, n_users,
        |  round((CAST(t2 AS DOUBLE)
        |         - CAST(n_users + 1 AS DOUBLE) * CAST(s AS DOUBLE))
        |        / (CAST(n_users AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS gini
        |FROM a ORDER BY event_type""".stripMargin,

    "ev_mk_trend" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(d.sc, 0) AS sc
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |ss AS (
        |  SELECT a.event_type,
        |    CAST(sum(sign(b.sc - a.sc)) AS BIGINT) AS s_stat
        |  FROM f a JOIN f b ON a.event_type = b.event_type AND a.d < b.d
        |  GROUP BY 1),
        |ties AS (
        |  SELECT event_type, CAST(sum(m) AS BIGINT) AS n,
        |    sum(CAST(m AS HUGEINT) * (m - 1) * (2 * m + 5)) AS tt
        |  FROM (SELECT event_type, sc, count(*) AS m FROM f GROUP BY 1, 2)
        |  GROUP BY 1),
        |g AS (
        |  SELECT ss.event_type, n, s_stat,
        |    CAST(CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - tt
        |      AS BIGINT) AS var_num18,
        |    CASE WHEN s_stat > 0 THEN s_stat - 1
        |         WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END AS znum
        |  FROM ss JOIN ties USING (event_type))
        |SELECT event_type, n AS n_days, s_stat, var_num18,
        |  round(CASE WHEN var_num18 > 0
        |    THEN CAST(znum AS DOUBLE) / sqrt(CAST(var_num18 AS DOUBLE) / 18.0)
        |    END, 6) AS z
        |FROM g ORDER BY event_type""".stripMargin,

    "ev_theil_sen" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(d.sc, 0) AS sc
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |p AS (
        |  SELECT a.event_type, a.d AS da, b.d AS db,
        |    CAST(b.sc - a.sc AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
        |  FROM f a JOIN f b ON a.event_type = b.event_type AND a.d < b.d),
        |np AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs
        |       FROM p GROUP BY 1),
        |r AS (SELECT event_type, slope, row_number() OVER (
        |        PARTITION BY event_type ORDER BY slope, da, db) AS rn
        |      FROM p)
        |SELECT r.event_type, n_pairs,
        |  round(slope, 6) AS slope_cents_per_day
        |FROM r JOIN np USING (event_type)
        |WHERE rn = (n_pairs + 1) // 2
        |ORDER BY event_type""".stripMargin,

    "ev_runs_test" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(d.sc, 0) AS sc
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |nd AS (SELECT event_type, count(*) AS n FROM f GROUP BY 1),
        |med AS (
        |  SELECT f.event_type, sc AS med FROM (
        |    SELECT event_type, sc, row_number() OVER (
        |      PARTITION BY event_type ORDER BY sc, d) AS rn
        |    FROM f) f JOIN nd USING (event_type)
        |  WHERE rn = (n + 1) // 2),
        |sq AS (
        |  SELECT f.event_type, d,
        |    CASE WHEN sc > med THEN 1 ELSE 0 END AS above,
        |    lag(CASE WHEN sc > med THEN 1 ELSE 0 END, 1) OVER (
        |      PARTITION BY f.event_type ORDER BY d) AS prev
        |  FROM f JOIN med ON f.event_type = med.event_type
        |  WHERE sc <> med),
        |g AS (
        |  SELECT event_type, CAST(sum(above) AS BIGINT) AS n_above,
        |    CAST(sum(1 - above) AS BIGINT) AS n_below,
        |    CAST(sum(CASE WHEN prev IS NULL OR prev <> above THEN 1 ELSE 0 END)
        |      AS BIGINT) AS runs
        |  FROM sq GROUP BY 1)
        |SELECT event_type, n_above, n_below, runs,
        |  round(CASE WHEN n_above > 0 AND n_below > 0 AND
        |      2.0 * n_above * n_below * (2.0 * n_above * n_below
        |        - (n_above + n_below)) > 0
        |    THEN (CAST(runs AS DOUBLE)
        |          - (2.0 * n_above * n_below / (n_above + n_below) + 1.0))
        |      / sqrt(2.0 * n_above * n_below
        |          * (2.0 * n_above * n_below - (n_above + n_below))
        |          / (CAST(n_above + n_below AS DOUBLE)
        |             * (n_above + n_below) * (n_above + n_below - 1)))
        |    END, 6) AS z
        |FROM g ORDER BY event_type""".stripMargin,

    "ev_autocorr" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(d.sc, 0) AS sc,
        |    lag(coalesce(d.sc, 0), 1) OVER (PARTITION BY s.event_type
        |      ORDER BY s.d) AS px
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |g AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(px AS HUGEINT)) AS sx, sum(CAST(sc AS HUGEINT)) AS sy,
        |    sum(CAST(px AS HUGEINT) * px) AS sxx,
        |    sum(CAST(sc AS HUGEINT) * sc) AS syy,
        |    sum(CAST(px AS HUGEINT) * sc) AS sxy
        |  FROM f WHERE px IS NOT NULL GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
        |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |         / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) END, 6) AS r_lag1
        |FROM g ORDER BY event_type""".stripMargin,

    "ev_acf" ->
      s"""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, datediff('day', DATE '1970-01-01', s.d) AS dd,
        |    coalesce(d.sc, 0) AS sc
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |lags AS (SELECT unnest(generate_series(1, $AcfMaxLag)) AS k),
        |g AS (
        |  SELECT y.event_type, l.k, count(*) AS n,
        |    sum(CAST(x.sc AS HUGEINT)) AS sx, sum(CAST(y.sc AS HUGEINT)) AS sy,
        |    sum(CAST(x.sc AS HUGEINT) * x.sc) AS sxx,
        |    sum(CAST(y.sc AS HUGEINT) * y.sc) AS syy,
        |    sum(CAST(x.sc AS HUGEINT) * y.sc) AS sxy
        |  FROM f y CROSS JOIN lags l
        |  JOIN f x ON x.event_type = y.event_type AND x.dd = y.dd - l.k
        |  GROUP BY 1, 2)
        |SELECT event_type, CAST(k AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
        |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
        |         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |         / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) END, 6) AS r
        |FROM g ORDER BY event_type, lag""".stripMargin,

    "ev_poisson_disp" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, coalesce(d.c, 0) AS c
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |g AS (
        |  SELECT event_type, count(*) AS n, sum(c) AS s,
        |    sum(CAST(c AS HUGEINT) * c) AS q
        |  FROM f GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  CAST(s AS BIGINT) AS n_events,
        |  round(CAST(s AS DOUBLE) / n, 6) AS mean_per_day,
        |  round(CASE WHEN s > 0 AND n > 1 THEN
        |    CAST(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s AS DOUBLE)
        |    / (CAST(n - 1 AS DOUBLE) * CAST(s AS DOUBLE)) END, 6) AS dispersion,
        |  round(CASE WHEN s > 0 THEN
        |    CAST(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s AS DOUBLE)
        |    / CAST(s AS DOUBLE) END, 6) AS chi2_disp
        |FROM g ORDER BY event_type""".stripMargin,

    "ev_odds_ratio" ->
      """WITH g AS (
        |  SELECT event_type,
        |    sum(we * hi) AS a, sum((1 - we) * hi) AS b,
        |    sum(we * (1 - hi)) AS c, sum((1 - we) * (1 - hi)) AS d
        |  FROM (
        |    SELECT event_type,
        |      CASE WHEN isodow(CAST(ts AS DATE)) >= 6 THEN 1 ELSE 0 END AS we,
        |      CASE WHEN value > 99.5 THEN 1 ELSE 0 END AS hi
        |    FROM events)
        |  GROUP BY 1)
        |SELECT event_type,
        |  CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
        |  CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
        |  round(CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
        |    THEN CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE) END, 6)
        |    AS odds_ratio,
        |  round(CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
        |    THEN exp(ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE))
        |      - 1.96 * sqrt(CAST(1 AS DOUBLE) / a + CAST(1 AS DOUBLE) / b
        |        + CAST(1 AS DOUBLE) / c + CAST(1 AS DOUBLE) / d)) END, 6)
        |    AS ci_lo,
        |  round(CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
        |    THEN exp(ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE))
        |      + 1.96 * sqrt(CAST(1 AS DOUBLE) / a + CAST(1 AS DOUBLE) / b
        |        + CAST(1 AS DOUBLE) / c + CAST(1 AS DOUBLE) / d)) END, 6)
        |    AS ci_hi
        |FROM g ORDER BY event_type""".stripMargin,

    "ev_hurst" ->
      s"""WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, coalesce(d.sc, 0) AS sc,
        |    row_number() OVER (PARTITION BY s.event_type ORDER BY s.d) - 1 AS t
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |wins AS (SELECT unnest([${HurstWins.mkString(", ")}]) AS w),
        |rws AS (
        |  SELECT event_type, w, sc, t, t // w AS blk FROM f CROSS JOIN wins),
        |withp AS (
        |  SELECT event_type, w, blk, sc,
        |    sum(CAST(sc AS HUGEINT)) OVER (PARTITION BY event_type, w, blk
        |      ORDER BY t) AS p,
        |    count(*) OVER (PARTITION BY event_type, w, blk ORDER BY t) AS j
        |  FROM rws),
        |btot AS (
        |  SELECT event_type, w, blk, sum(sc) AS bs,
        |    sum(CAST(sc AS HUGEINT) * sc) * w
        |      - CAST(sum(sc) AS HUGEINT) * sum(sc) AS vd
        |  FROM rws GROUP BY 1, 2, 3 HAVING count(*) = w),
        |rs AS (
        |  SELECT event_type, w, blk,
        |    CASE WHEN vd > 0 THEN
        |      CAST(max(wy) - min(wy) AS DOUBLE) / sqrt(CAST(vd AS DOUBLE))
        |    END AS rs
        |  FROM (
        |    SELECT wp.event_type, wp.w, wp.blk, bt.vd,
        |      wp.p * wp.w - CAST(wp.j AS HUGEINT) * bt.bs AS wy
        |    FROM withp wp JOIN btot bt
        |      ON wp.event_type = bt.event_type AND wp.w = bt.w
        |      AND wp.blk = bt.blk)
        |  GROUP BY event_type, w, blk, vd),
        |mrs AS (
        |  SELECT event_type, w,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(rs ORDER BY blk)), (a, b) -> a + b)
        |      / CAST(count(*) AS DOUBLE) AS mrs
        |  FROM rs WHERE rs IS NOT NULL GROUP BY 1, 2),
        |piv AS (
        |  SELECT event_type,
        |    max(CASE WHEN w = ${HurstWins(0)} THEN mrs END) AS rs_a,
        |    max(CASE WHEN w = ${HurstWins(1)} THEN mrs END) AS rs_b,
        |    max(CASE WHEN w = ${HurstWins(2)} THEN mrs END) AS rs_c
        |  FROM mrs GROUP BY 1),
        |nd AS (SELECT event_type, count(*) AS n_days FROM f GROUP BY 1)
        |SELECT nd.event_type, CAST(n_days AS BIGINT) AS n_days,
        |  round(rs_a, 6) AS rs_w5, round(rs_b, 6) AS rs_w10,
        |  round(rs_c, 6) AS rs_w15,
        |  round(CASE WHEN rs_a IS NOT NULL AND rs_b IS NOT NULL
        |      AND rs_c IS NOT NULL AND rs_a > 0 AND rs_b > 0 AND rs_c > 0
        |    THEN ${HurstCoef(HurstWins(0))} * ln(rs_a)
        |      + ${HurstCoef(HurstWins(1))} * ln(rs_b)
        |      + ${HurstCoef(HurstWins(2))} * ln(rs_c) END, 6) AS hurst
        |FROM nd LEFT JOIN piv ON nd.event_type = piv.event_type
        |ORDER BY nd.event_type""".stripMargin,

    "ev_granger" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT min(d) AS mn, max(d) AS mx FROM d),
        |typs AS (SELECT DISTINCT event_type FROM d),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM typs CROSS JOIN rng),
        |f0 AS (
        |  SELECT s.event_type, s.d, coalesce(dd.sc, 0) AS sc
        |  FROM spine s LEFT JOIN d dd
        |    ON s.event_type = dd.event_type AND s.d = dd.d),
        |f AS (
        |  SELECT event_type, d, sc,
        |    lag(sc) OVER (PARTITION BY event_type ORDER BY d) AS lagv
        |  FROM f0),
        |fl AS (SELECT * FROM f WHERE lagv IS NOT NULL),
        |g AS (
        |  SELECT x.event_type AS type_x, y.event_type AS type_y,
        |    count(*) AS n,
        |    sum(CAST(y.sc AS HUGEINT)) AS sy,
        |    sum(CAST(y.lagv AS HUGEINT)) AS sl,
        |    sum(CAST(x.lagv AS HUGEINT)) AS sx,
        |    sum(CAST(y.sc AS HUGEINT) * y.sc) AS syy,
        |    sum(CAST(y.lagv AS HUGEINT) * y.lagv) AS sll,
        |    sum(CAST(x.lagv AS HUGEINT) * x.lagv) AS sxx,
        |    sum(CAST(y.sc AS HUGEINT) * y.lagv) AS syl,
        |    sum(CAST(y.sc AS HUGEINT) * x.lagv) AS syx,
        |    sum(CAST(y.lagv AS HUGEINT) * x.lagv) AS slx
        |  FROM fl y JOIN fl x
        |    ON y.d = x.d AND x.event_type <> y.event_type
        |  GROUP BY 1, 2),
        |c AS (
        |  SELECT type_x, type_y, n,
        |    CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
        |    CAST(n * sll - sl * sl AS DOUBLE) AS cll,
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS cxx,
        |    CAST(n * syl - sy * sl AS DOUBLE) AS cyl,
        |    CAST(n * syx - sy * sx AS DOUBLE) AS cyx,
        |    CAST(n * slx - sl * sx AS DOUBLE) AS clx
        |  FROM g),
        |r AS (
        |  SELECT type_x, type_y, n, cll,
        |    cll * cxx - clx * clx AS det,
        |    cyy - cyl * cyl / cll AS rss_r,
        |    cyy - (cxx * cyl * cyl - 2.0 * clx * cyl * cyx
        |      + cll * cyx * cyx) / (cll * cxx - clx * clx) AS rss_u
        |  FROM c)
        |SELECT type_x, type_y, CAST(n AS BIGINT) AS n,
        |  round(CASE WHEN n > 3 AND cll > 0 AND det > 0 AND rss_u > 0
        |    THEN CAST(n - 3 AS DOUBLE) * (rss_r - rss_u) / rss_u END, 6)
        |    AS f_stat,
        |  round(CASE WHEN n > 3 AND cll > 0 AND det > 0 AND rss_u > 0
        |    THEN rss_u / rss_r END, 6) AS rss_ratio
        |FROM r ORDER BY type_x, type_y""".stripMargin,

    "ev_entropy_rate" ->
      """WITH tr AS (
        |  SELECT f, event_type AS t, count(*) AS c FROM (
        |    SELECT event_type, lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS f
        |    FROM events)
        |  WHERE f IS NOT NULL GROUP BY 1, 2),
        |rf AS (SELECT f, sum(c) AS rf FROM tr GROUP BY 1),
        |nn AS (SELECT sum(c) AS nn FROM tr),
        |h AS (
        |  SELECT tr.f, max(rf.rf) AS n_out, count(DISTINCT tr.t) AS k_next,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list((CAST(c AS DOUBLE) / CAST(rf.rf AS DOUBLE))
        |        * ln(CAST(rf.rf AS DOUBLE) / CAST(c AS DOUBLE))
        |        ORDER BY tr.t)),
        |      (a, b) -> a + b) AS h
        |  FROM tr JOIN rf ON tr.f = rf.f GROUP BY tr.f)
        |SELECT h.f AS event_type, CAST(n_out AS BIGINT) AS n_out,
        |  CAST(k_next AS BIGINT) AS k_next,
        |  round(CAST(n_out AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS pi,
        |  round(h, 6) AS h_cond,
        |  round((CAST(n_out AS DOUBLE) / CAST(nn AS DOUBLE)) * h, 6)
        |    AS rate_contrib
        |FROM h CROSS JOIN nn ORDER BY event_type""".stripMargin,

    "ev_burstiness" ->
      """WITH e AS (
        |  SELECT event_type, ts, event_id, epoch_us(ts) AS us FROM events),
        |g0 AS (
        |  SELECT event_type,
        |    us - lag(us, 1) OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id) AS t
        |  FROM e),
        |g AS (
        |  SELECT event_type, count(*) AS n, sum(CAST(t AS HUGEINT)) AS st,
        |    sum(CAST(t AS HUGEINT) * t) AS stt
        |  FROM g0 WHERE t IS NOT NULL GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
        |  round(CAST(st AS DOUBLE) / CAST(n AS DOUBLE) / 1e6, 6)
        |    AS mean_gap_s,
        |  round(CASE WHEN n > 1 AND st > 0 THEN
        |    (sqrt(CAST(n * stt - st * st AS DOUBLE)) - CAST(st AS DOUBLE))
        |    / (sqrt(CAST(n * stt - st * st AS DOUBLE)) + CAST(st AS DOUBLE))
        |    END, 6) AS b_coef
        |FROM g ORDER BY event_type""".stripMargin,

    "ev_seasonal_strength" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, isodow(s.d) - 1 AS dow, coalesce(dd.sc, 0) AS sc
        |  FROM spine s LEFT JOIN d dd
        |    ON s.event_type = dd.event_type AND s.d = dd.d),
        |g AS (
        |  SELECT event_type, dow, count(*) AS ng,
        |    sum(CAST(sc AS HUGEINT)) AS sg, sum(CAST(sc AS HUGEINT) * sc) AS qg
        |  FROM f GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, sum(ng) AS n, sum(sg) AS st, sum(qg) AS qt,
        |    count(*) AS k,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
        |        / CAST(ng AS DOUBLE) ORDER BY dow)), (a, b) -> a + b) AS aa
        |  FROM g GROUP BY 1),
        |r AS (
        |  SELECT event_type, n, k, aa,
        |    CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS cm,
        |    CAST(qt AS DOUBLE) AS qtd
        |  FROM tot)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |  CAST(k AS BIGINT) AS k_dow,
        |  round(CASE WHEN k > 1 AND n > k AND qtd - aa > 0 THEN
        |    ((aa - cm) / CAST(k - 1 AS DOUBLE))
        |    / ((qtd - aa) / CAST(n - k AS DOUBLE)) END, 6) AS f_stat,
        |  round(CASE WHEN qtd - cm > 0 THEN (aa - cm) / (qtd - cm) END, 6)
        |    AS seasonal_strength
        |FROM r ORDER BY event_type""".stripMargin,

    "ev_decompose" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(dd.sc, 0) AS sc
        |  FROM spine s LEFT JOIN d dd
        |    ON s.event_type = dd.event_type AND s.d = dd.d),
        |t AS (
        |  SELECT event_type, d, sc,
        |    sum(CAST(sc AS HUGEINT)) OVER w AS s7, count(*) OVER w AS n7
        |  FROM f
        |  WINDOW w AS (PARTITION BY event_type ORDER BY d
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |g AS (
        |  SELECT event_type, d, sc, s7, n7,
        |    CASE WHEN n7 = 7 THEN CAST(sc AS HUGEINT) * 7 - s7 END AS d7,
        |    isodow(d) - 1 AS dow
        |  FROM t),
        |sidx AS (
        |  SELECT event_type, dow,
        |    CAST(sum(d7) AS DOUBLE) / (7.0 * CAST(count(*) AS DOUBLE)) AS m
        |  FROM g WHERE d7 IS NOT NULL GROUP BY 1, 2),
        |cen AS (
        |  SELECT event_type,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list(m ORDER BY dow)), (a, b) -> a + b) AS sm,
        |    count(*) AS kd
        |  FROM sidx GROUP BY 1),
        |sea AS (
        |  SELECT s.event_type, s.dow, s.m - c.sm / CAST(c.kd AS DOUBLE) AS seas
        |  FROM sidx s JOIN cen c ON s.event_type = c.event_type)
        |SELECT g.event_type, g.d AS day,
        |  round(CAST(g.sc AS DOUBLE) / 100.0, 6) AS value,
        |  round(CASE WHEN n7 = 7 THEN CAST(s7 AS DOUBLE) / 7.0 / 100.0 END, 6)
        |    AS trend,
        |  round(seas / 100.0, 6) AS seasonal,
        |  round(CASE WHEN n7 = 7 THEN CAST(g.d7 AS DOUBLE) / 7.0 / 100.0
        |    - seas / 100.0 END, 6) AS residual
        |FROM g LEFT JOIN sea
        |  ON g.event_type = sea.event_type AND g.dow = sea.dow
        |ORDER BY g.event_type, day""".stripMargin,

    "ev_cusum_cp" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(d.sc, 0) AS sc
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |tot AS (SELECT event_type, count(*) AS n, CAST(sum(sc) AS BIGINT) AS s
        |        FROM f GROUP BY 1),
        |p1 AS (
        |  SELECT f.event_type, f.d, n,
        |    sum(CAST(sc AS HUGEINT) * n - s) OVER (PARTITION BY f.event_type
        |      ORDER BY f.d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS p
        |  FROM f JOIN tot USING (event_type)),
        |p2 AS (
        |  SELECT event_type, d, n, p,
        |    min(p) OVER (PARTITION BY event_type ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rmin
        |  FROM p1),
        |cu AS (SELECT event_type, d, n, p - least(rmin, 0) AS cu FROM p2),
        |am AS (
        |  SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
        |    max(struct_pack(c := cu, nd := -(d - DATE '1970-01-01'),
        |      day := d)) AS t
        |  FROM cu GROUP BY 1)
        |SELECT event_type, n_days, struct_extract(t, 'day') AS change_day,
        |  CAST(struct_extract(t, 'c') AS BIGINT) AS cusum_scaled,
        |  round(CAST(struct_extract(t, 'c') AS DOUBLE) / n_days / 100.0, 6)
        |    AS cusum_mean_excess
        |FROM am ORDER BY event_type""".stripMargin,

    "ev_sbc_class" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(value > 99.5 AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', min(d), max(d)) + 1 AS BIGINT) AS n_days
        |  FROM d GROUP BY 1),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM d WHERE c > 0 GROUP BY 1)
        |SELECT g.event_type, n_days, m AS n_demand_days,
        |  round(CAST(n_days AS DOUBLE) / CAST(m AS DOUBLE), 6) AS adi,
        |  round((CAST(s2 AS DOUBLE) / CAST(m AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
        |        * (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE)))
        |    / ((CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
        |       * (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))), 6) AS cv2,
        |  CASE
        |    WHEN CAST(n_days AS DOUBLE) / CAST(m AS DOUBLE) < 1.32
        |     AND (CAST(s2 AS DOUBLE) / CAST(m AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
        |        * (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE)))
        |    / ((CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
        |       * (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))) < 0.49
        |      THEN 'smooth'
        |    WHEN CAST(n_days AS DOUBLE) / CAST(m AS DOUBLE) >= 1.32
        |     AND (CAST(s2 AS DOUBLE) / CAST(m AS DOUBLE)
        |      - (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
        |        * (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE)))
        |    / ((CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
        |       * (CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))) < 0.49
        |      THEN 'intermittent'
        |    WHEN CAST(n_days AS DOUBLE) / CAST(m AS DOUBLE) < 1.32
        |      THEN 'erratic'
        |    ELSE 'lumpy' END AS sbc_class
        |FROM g JOIN span ON g.event_type = span.event_type
        |ORDER BY g.event_type""".stripMargin,

    // The Croston recursion as a recursive CTE over the day index (the
    // ev_holt discipline); each CASE writes the step expression in full.
    "ev_croston" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(value > 99.5 AS BIGINT)) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(d.c, 0) AS c
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |idx AS MATERIALIZED (
        |  SELECT event_type,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
        |      AS BIGINT) AS i,
        |    CAST(c AS DOUBLE) AS v
        |  FROM f),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |      FROM idx GROUP BY 1),
        |rec(event_type, i, z, p, q, nd) AS (
        |  SELECT event_type, CAST(0 AS BIGINT), 0.0::DOUBLE, 0.0::DOUBLE,
        |    1.0::DOUBLE, CAST(0 AS BIGINT)
        |  FROM n
        |  UNION ALL
        |  SELECT r.event_type, x.i,
        |    CASE WHEN x.v > 0 THEN
        |      CASE WHEN r.nd = 0 THEN x.v
        |           ELSE 0.25 * x.v + 0.75 * r.z END
        |    ELSE r.z END,
        |    CASE WHEN x.v > 0 THEN
        |      CASE WHEN r.nd = 0 THEN r.q
        |           ELSE 0.25 * r.q + 0.75 * r.p END
        |    ELSE r.p END,
        |    CASE WHEN x.v > 0 THEN 1.0::DOUBLE ELSE r.q + 1 END,
        |    CASE WHEN x.v > 0 THEN r.nd + 1 ELSE r.nd END
        |  FROM rec r JOIN idx x
        |    ON x.event_type = r.event_type AND x.i = r.i + 1)
        |SELECT r.event_type AS event_type, n.n_days,
        |  r.nd AS n_demand_days,
        |  round(r.z, 6) AS demand_size,
        |  round(r.p, 6) AS demand_interval,
        |  round(CASE WHEN r.p > 0 THEN r.z / r.p END, 6) AS croston_forecast
        |FROM rec r JOIN n
        |  ON r.event_type = n.event_type AND r.i = n.n_days
        |ORDER BY event_type""".stripMargin,

    // The PH recursion as a recursive CTE over the day index (the
    // ev_holt discipline); m', mn', and the alarm CASE each write the
    // step expression out in full so the double tree is identical.
    "ev_page_hinkley" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sc,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |idx AS MATERIALIZED (
        |  SELECT event_type,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
        |      AS BIGINT) AS i,
        |    CAST(sc AS DOUBLE) / (100.0 * CAST(cnt AS DOUBLE)) AS v
        |  FROM d),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |      FROM idx GROUP BY 1),
        |rec(event_type, i, s, m, mn, alarm) AS (
        |  SELECT event_type, CAST(0 AS BIGINT), 0.0::DOUBLE, 0.0::DOUBLE,
        |    0.0::DOUBLE, CAST(0 AS BIGINT)
        |  FROM n
        |  UNION ALL
        |  SELECT r.event_type, x.i,
        |    r.s + x.v,
        |    r.m + (x.v - (r.s + x.v) / CAST(x.i AS DOUBLE) - 0.1),
        |    least(r.mn,
        |      r.m + (x.v - (r.s + x.v) / CAST(x.i AS DOUBLE) - 0.1)),
        |    CASE WHEN r.alarm = 0 AND
        |        (r.m + (x.v - (r.s + x.v) / CAST(x.i AS DOUBLE) - 0.1))
        |        - least(r.mn,
        |            r.m + (x.v - (r.s + x.v) / CAST(x.i AS DOUBLE) - 0.1))
        |        > 5.0
        |      THEN x.i ELSE r.alarm END
        |  FROM rec r JOIN idx x
        |    ON x.event_type = r.event_type AND x.i = r.i + 1)
        |SELECT r.event_type AS event_type, n.n_days,
        |  round(r.m, 6) AS cum_dev, round(r.mn, 6) AS min_dev,
        |  round(r.m - r.mn, 6) AS ph_stat, r.alarm AS alarm_day
        |FROM rec r JOIN n
        |  ON r.event_type = n.event_type AND r.i = n.n_days
        |ORDER BY event_type""".stripMargin,

    // Textbook recursion as a recursive CTE over the day index (NOT
    // list_reduce — see the Spark-side scaladoc for the DuckDB 1.0
    // struct_pack sequential-eval footgun). l2 is written out twice in
    // the b update exactly as the Spark fold's expression tree computes
    // it, so the double stream is identical.
    "ev_holt" ->
      """WITH RECURSIVE d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(d.sc, 0) AS sc
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |idx AS MATERIALIZED (
        |  SELECT event_type,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
        |      AS BIGINT) AS i,
        |    CAST(sc AS DOUBLE) / 100 AS v
        |  FROM f),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |      FROM idx GROUP BY 1),
        |rec(event_type, i, l, b, sse) AS (
        |  SELECT event_type, i, v, 0.0::DOUBLE, 0.0::DOUBLE
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT r.event_type, x.i,
        |    0.5::DOUBLE * x.v + 0.5::DOUBLE * (r.l + r.b),
        |    0.25::DOUBLE * ((0.5::DOUBLE * x.v + 0.5::DOUBLE * (r.l + r.b))
        |      - r.l) + 0.75::DOUBLE * r.b,
        |    r.sse + (x.v - (r.l + r.b)) * (x.v - (r.l + r.b))
        |  FROM rec r JOIN idx x
        |    ON x.event_type = r.event_type AND x.i = r.i + 1)
        |SELECT r.event_type AS event_type, n.n_days, round(r.l, 6) AS level,
        |  round(r.b, 6) AS trend,
        |  round(r.l + 7.0::DOUBLE * r.b, 6) AS forecast_7d,
        |  round(r.sse, 6) AS sse
        |FROM rec r JOIN n ON r.event_type = n.event_type AND r.i = n.n_days
        |ORDER BY event_type""".stripMargin,

    "ev_kendall_xcorr" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT min(d) AS mn, max(d) AS mx FROM d),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM (SELECT DISTINCT event_type FROM d) CROSS JOIN rng),
        |f AS MATERIALIZED (
        |  SELECT s.event_type, s.d, coalesce(d.sc, 0) AS sc
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |pt AS MATERIALIZED (
        |  SELECT a.event_type AS t1, b.event_type AS t2, a.d,
        |    a.sc AS x, b.sc AS y
        |  FROM f a JOIN f b ON a.d = b.d AND a.event_type < b.event_type),
        |s AS (
        |  SELECT p.t1, p.t2,
        |    CAST(sum(CAST(sign(q.x - p.x) * sign(q.y - p.y) AS BIGINT))
        |      AS BIGINT) AS s_stat,
        |    count(*) AS n0
        |  FROM pt p JOIN pt q
        |    ON p.t1 = q.t1 AND p.t2 = q.t2 AND p.d < q.d
        |  GROUP BY 1, 2),
        |nd AS (SELECT t1, t2, count(*) AS n_days FROM pt GROUP BY 1, 2),
        |tx AS (
        |  SELECT event_type AS t, CAST(sum(m * (m - 1)) AS BIGINT) AS nt2
        |  FROM (SELECT event_type, sc, count(*) AS m FROM f GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT s.t1, s.t2, CAST(n_days AS BIGINT) AS n_days, s_stat,
        |  round(CASE
        |    WHEN (n0 - ntx.nt2 // 2) * (n0 - nty.nt2 // 2) > 0
        |    THEN CAST(s_stat AS DOUBLE)
        |      / sqrt(CAST((n0 - ntx.nt2 // 2) * (n0 - nty.nt2 // 2) AS DOUBLE))
        |    END, 6) AS tau_b
        |FROM s JOIN nd USING (t1, t2)
        |JOIN tx ntx ON s.t1 = ntx.t
        |JOIN tx nty ON s.t2 = nty.t
        |ORDER BY t1, t2""".stripMargin,

    "ev_peak_detect" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(d.sc, 0) AS sc
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d),
        |l AS (
        |  SELECT event_type, d, sc,
        |    lag(sc) OVER w AS prev, lead(sc) OVER w AS nxt
        |  FROM f WINDOW w AS (PARTITION BY event_type ORDER BY d))
        |SELECT event_type, d AS day, sc AS cents, prev AS prev_cents,
        |  nxt AS next_cents,
        |  CAST(sc - greatest(prev, nxt) AS BIGINT) AS prominence
        |FROM l
        |WHERE prev IS NOT NULL AND nxt IS NOT NULL AND sc > prev AND sc > nxt
        |ORDER BY event_type, day""".stripMargin,

    "ev_forecast_sn" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events GROUP BY 1, 2),
        |rng AS (SELECT event_type, min(d) AS mn, max(d) AS mx FROM d GROUP BY 1),
        |spine AS (
        |  SELECT event_type, CAST(unnest(generate_series(mn, mx,
        |    INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM rng),
        |f AS (
        |  SELECT s.event_type, s.d, coalesce(d.sc, 0) AS sc,
        |    lag(coalesce(d.sc, 0), 7) OVER w AS l7,
        |    lag(coalesce(d.sc, 0), 1) OVER w AS l1
        |  FROM spine s LEFT JOIN d ON s.event_type = d.event_type AND s.d = d.d
        |  WINDOW w AS (PARTITION BY s.event_type ORDER BY s.d)),
        |a AS (
        |  SELECT event_type, count(*) AS n_days,
        |    CAST(sum(abs(sc - l7)) AS BIGINT) AS sae7,
        |    CAST(sum(abs(sc - l1)) AS BIGINT) AS sae1
        |  FROM f WHERE l7 IS NOT NULL AND l1 IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_days,
        |  round(CAST(sae7 AS DOUBLE) / n_days / 100.0, 6) AS mae_sn,
        |  round(CAST(sae1 AS DOUBLE) / n_days / 100.0, 6) AS mae_naive1,
        |  round(CAST(sae7 AS DOUBLE) / nullif(sae1, 0), 6) AS mase
        |FROM a ORDER BY event_type""".stripMargin,

    "ev_pattern" ->
      s"""WITH g AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN lag(epoch_us(ts), 1)
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |         OR epoch_us(ts) - lag(epoch_us(ts), 1)
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) >= $GapUs
         |    THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |r AS (
         |  SELECT user_id, event_type, ts, event_id,
         |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS sess
         |  FROM g),
         |rp AS (
         |  SELECT user_id, sess, event_type, ts,
         |    CAST(row_number() OVER (PARTITION BY user_id, sess
         |      ORDER BY ts, event_id) AS BIGINT) AS pos
         |  FROM r),
         |sg AS (
         |  SELECT user_id, sess, min(pos) AS ps, arg_min(ts, pos) AS ts_s
         |  FROM rp WHERE event_type = 'signup' GROUP BY 1, 2),
         |pu AS (
         |  SELECT rp.user_id, rp.sess, min(pos) AS pe, arg_min(ts, pos) AS ts_p
         |  FROM rp JOIN sg ON rp.user_id = sg.user_id AND rp.sess = sg.sess
         |  WHERE event_type = 'purchase' AND pos > ps GROUP BY 1, 2),
         |m AS (SELECT sg.user_id, sg.sess, ps, ts_s, pe, ts_p
         |      FROM sg JOIN pu ON sg.user_id = pu.user_id AND sg.sess = pu.sess),
         |er AS (
         |  SELECT rp.user_id, rp.sess, count(*) AS ne
         |  FROM rp JOIN m ON rp.user_id = m.user_id AND rp.sess = m.sess
         |  WHERE event_type = 'error' AND pos > ps AND pos < pe GROUP BY 1, 2)
         |SELECT m.user_id, m.sess, ps AS signup_pos, pe AS purchase_pos,
         |  pe - ps - 1 AS steps_between,
         |  epoch_us(ts_p) - epoch_us(ts_s) AS latency_us
         |FROM m LEFT JOIN er ON m.user_id = er.user_id AND m.sess = er.sess
         |WHERE coalesce(ne, 0) = 0
         |ORDER BY m.user_id, m.sess""".stripMargin,

    "ev_path" ->
      s"""WITH g AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    CASE WHEN lag(epoch_us(ts), 1)
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |         OR epoch_us(ts) - lag(epoch_us(ts), 1)
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) >= $GapUs
         |    THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |sid AS (
         |  SELECT user_id, event_type, ts, event_id,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |  FROM g),
         |sl AS (
         |  SELECT user_id, sess,
         |    list(event_type ORDER BY ts, event_id) AS t
         |  FROM sid GROUP BY 1, 2),
         |p AS (
         |  SELECT unnest(list_transform(range(1, len(t) - 1),
         |    i -> t[i] || '>' || t[i + 1] || '>' || t[i + 2])) AS path
         |  FROM sl WHERE len(t) >= 3)
         |SELECT path, count(*) AS n FROM p GROUP BY path
         |ORDER BY n DESC, path LIMIT $PathTopN""".stripMargin,

    "ev_powerusers" ->
      """WITH ud AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS ev
        |  FROM events GROUP BY 1, 2),
        |pu AS (
        |  SELECT user_id, count(*) AS days, CAST(sum(ev) AS BIGINT) AS ev
        |  FROM ud GROUP BY 1),
        |h AS (
        |  SELECT days AS active_days, count(*) AS n_users,
        |    CAST(sum(ev) AS BIGINT) AS n_events
        |  FROM pu GROUP BY 1),
        |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS nu FROM h)
        |SELECT active_days, n_users, n_events,
        |  round(CAST(n_users AS DOUBLE) / nu, 6) AS user_share,
        |  CAST(sum(n_users) OVER (ORDER BY active_days DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM h, t ORDER BY active_days""".stripMargin,

    "ev_decile_lift" -> {
      val thrs = (1 to 9).map(j =>
        s"min(CASE WHEN cum * 10 >= $j * (SELECT nu FROM n) THEN v END) AS t$j")
        .mkString(", ")
      val dec = (1 to 9).map(j => s"CAST(freq > t$j AS BIGINT)")
        .mkString(" + ") + " + 1"
      s"""WITH u AS (
         |  SELECT user_id, count(*) AS freq,
         |    max(CAST(event_type = 'purchase' AS BIGINT)) AS conv
         |  FROM events GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM u),
         |h AS (SELECT freq AS v, count(*) AS m FROM u GROUP BY 1),
         |c AS (SELECT v, sum(m) OVER (ORDER BY v
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM h),
         |t AS (SELECT $thrs FROM c),
         |d AS (SELECT user_id, conv, $dec AS decile FROM u, t),
         |hist AS (SELECT decile, count(*) AS n_users,
         |           CAST(sum(conv) AS BIGINT) AS n_conv
         |         FROM d GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS tu,
         |          CAST(sum(n_conv) AS BIGINT) AS tc FROM hist)
         |SELECT decile, n_users, n_conv,
         |  round(CAST(n_conv AS DOUBLE) / n_users, 6) AS rate,
         |  round(CAST(n_conv AS DOUBLE) / n_users
         |        / (CAST(tc AS DOUBLE) / tu), 6) AS lift,
         |  round(CAST(sum(n_conv) OVER (ORDER BY decile DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    / tc, 6) AS cum_capture
         |FROM hist, tot ORDER BY decile DESC""".stripMargin
    },

    "ev_rfm" -> {
      def thr(metric: String) =
        s"""${metric}_h AS (
           |  SELECT $metric AS v, count(*) AS m FROM users GROUP BY 1),
           |${metric}_c AS (
           |  SELECT v, sum(m) OVER (ORDER BY v
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           |  FROM ${metric}_h),
           |${metric}_t AS (
           |  SELECT ${(1 to 4).map(k =>
          s"min(CASE WHEN cum * 5 >= $k * (SELECT nu FROM n) THEN v END) AS ${metric}_t$k")
          .mkString(", ")}
           |  FROM ${metric}_c)""".stripMargin
      def score(metric: String) =
        (1 to 4).map(k =>
          s"CAST($metric > ${metric}_t$k AS BIGINT)").mkString(" + ") + " + 1"
      s"""WITH users AS (
         |  SELECT user_id,
         |    max(epoch_us(ts) // 86400000000) AS rec,
         |    count(*) AS freq,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS mon
         |  FROM events GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM users),
         |${thr("rec")},
         |${thr("freq")},
         |${thr("mon")}
         |SELECT user_id, rec AS last_day, freq AS frequency,
         |  CAST(mon AS DOUBLE) / 100.0 AS monetary,
         |  ${score("rec")} AS r_score, ${score("freq")} AS f_score,
         |  ${score("mon")} AS m_score,
         |  (${score("rec")}) * 100 + (${score("freq")}) * 10 + (${score("mon")})
         |    AS rfm
         |FROM users, rec_t, freq_t, mon_t
         |ORDER BY user_id""".stripMargin
    },

    "ev_anomaly" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type, ts, value,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
         |  FROM events),
         |w AS (
         |  SELECT event_id, event_type, value, c,
         |    count(*) OVER win AS n,
         |    sum(c) OVER win AS cs,
         |    sum(CAST(c AS HUGEINT) * c) OVER win AS css
         |  FROM e
         |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
         |                 ROWS BETWEEN ${AnomWin - 1} PRECEDING AND CURRENT ROW)),
         |d AS (
         |  SELECT *, n * css - CAST(cs AS HUGEINT) * cs AS disc FROM w)
         |SELECT event_id, event_type, value,
         |  round(CAST(c * n - cs AS DOUBLE) / sqrt(CAST(disc AS DOUBLE)), 6) AS z
         |FROM d
         |WHERE n >= $AnomMinN AND disc > 0
         |  AND abs(CAST(c * n - cs AS DOUBLE)
         |          / sqrt(CAST(disc AS DOUBLE))) >= $AnomZ
         |ORDER BY event_id""".stripMargin,

    "ev_seasonality" ->
      """WITH g AS (
        |  SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS h,
        |    count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY o DESC, h) AS rn FROM g),
        |a AS (
        |  SELECT event_type, CAST(sum(o) AS BIGINT) AS n,
        |    sum(CAST(o AS HUGEINT) * o) AS so2,
        |    max(CASE WHEN rn = 1 THEN h END) AS peak_hour,
        |    max(CASE WHEN rn = 1 THEN o END) AS peak_o
        |  FROM r GROUP BY 1)
        |SELECT event_type, n, peak_hour,
        |  round(CAST(peak_o AS DOUBLE) / n, 6) AS peak_share,
        |  round((24 * CAST(so2 AS DOUBLE) - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
        |        / n, 6) AS chi2_uniform
        |FROM a ORDER BY event_type""".stripMargin,

    // Generated: MarkovIters unrolled mat-vec CTE layers, terms folded in
    // from-state order (the driver loop's exact arithmetic).
    "ev_markov" -> {
      // MATERIALIZED throughout — the gr_kcore lesson: un-materialized,
      // DuckDB inlines p's whole subtree into every one of the unrolled
      // layers and the planner never returns.
      val layers = (0 until MarkovIters).map { k =>
        s"""pi${k + 1} AS MATERIALIZED (
           |  SELECT p.t AS st, list_sum(list(pi$k.pi * p.pr ORDER BY p.f)) AS pi
           |  FROM p JOIN pi$k ON p.f = pi$k.st GROUP BY p.t)""".stripMargin
      }.mkString(",\n")
      s"""WITH tr AS MATERIALIZED (
         |  SELECT prev AS f, event_type AS t, count(*) AS c FROM (
         |    SELECT event_type,
         |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |    FROM events)
         |  WHERE prev IS NOT NULL GROUP BY 1, 2),
         |rs AS (SELECT f, sum(c) AS s FROM tr GROUP BY f),
         |p AS MATERIALIZED (
         |  SELECT tr.f, tr.t, CAST(c AS DOUBLE) / s AS pr FROM tr JOIN rs USING (f)),
         |k0 AS (SELECT count(DISTINCT event_type) AS k FROM events),
         |pi0 AS MATERIALIZED (
         |  SELECT DISTINCT event_type AS st, CAST(1.0 AS DOUBLE) / k AS pi
         |  FROM events, k0),
         |$layers
         |SELECT st AS event_type, round(pi, 6) AS pi FROM pi$MarkovIters
         |ORDER BY event_type""".stripMargin
    },

    "ev_ewma" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type, ts, value,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
         |  FROM events),
         |w AS (
         |  SELECT event_id, event_type, value, list(c) OVER win AS l
         |  FROM e
         |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
         |                 ROWS BETWEEN ${EwmaWin - 1} PRECEDING AND CURRENT ROW))
         |SELECT event_id, event_type, value,
         |  round(CAST(list_reduce(list_transform(list_reverse(l),
         |                                        x -> CAST(x AS HUGEINT)),
         |                         (acc, x) -> acc * 2 + x) AS DOUBLE)
         |        / CAST((CAST(1 AS BIGINT) << len(l)) - 1 AS DOUBLE)
         |        / 100.0, 6) AS ewma
         |FROM w ORDER BY event_id""".stripMargin,

    "ev_cumsum" ->
      """SELECT event_id, event_type, value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)))
        |         OVER (PARTITION BY event_type ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS running_sum
        |FROM events ORDER BY event_id""".stripMargin,

    "t6_session_window" ->
      s"""WITH g AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN lag(epoch_us(ts), 1)
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |         OR epoch_us(ts) - lag(epoch_us(ts), 1)
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) >= $GapUs
         |    THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |sid AS (
         |  SELECT user_id, ts, value,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |  FROM g)
         |SELECT user_id, min(ts) AS sess_start,
         |  max(ts) + INTERVAL 30 MINUTE AS sess_end,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM sid GROUP BY user_id, sess
         |ORDER BY user_id, sess_start""".stripMargin,

    "t7_sliding_window" ->
      """SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
        |         - k * 1800000000) AS win_start,
        |  event_type, count(*) AS n
        |FROM events, (SELECT unnest([0, 1]) AS k)
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,

    "ev_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type, count(*) AS users FROM s1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3
        |ORDER BY step""".stripMargin,

    "ev_rolling_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day AS d FROM ud),
        |fan AS (
        |  SELECT user_id, day + CAST(k AS INT) AS d
        |  FROM ud, (SELECT unnest(range(7)) AS k))
        |SELECT f.d, count(DISTINCT f.user_id) AS wau
        |FROM fan f JOIN days USING (d)
        |GROUP BY f.d ORDER BY f.d""".stripMargin,

    "ev_stickiness" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |fan AS (
        |  SELECT user_id, day + CAST(k AS INT) AS d,
        |    CAST(k = 0 AS INT) AS direct
        |  FROM ud, (SELECT unnest(range(28)) AS k)),
        |dd AS (SELECT user_id, d, max(direct) AS direct FROM fan GROUP BY 1, 2)
        |SELECT d, CAST(sum(direct) AS BIGINT) AS dau, count(*) AS mau,
        |  round(CAST(sum(direct) AS DOUBLE) / count(*), 6) AS stickiness
        |FROM dd GROUP BY d HAVING max(direct) = 1
        |ORDER BY d""".stripMargin,

    "ev_kaplan_meier" ->
      s"""WITH u AS (
         |  SELECT user_id, min(d) AS f, max(d) AS l
         |  FROM (SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events)
         |  GROUP BY 1),
         |h AS (SELECT max(l) AS h FROM u),
         |lab AS (
         |  SELECT l - f AS dur, CAST(l <= h - $KmCensorDays AS BIGINT) AS died
         |  FROM u, h),
         |hist AS (
         |  SELECT dur, CAST(sum(died) AS BIGINT) AS deaths,
         |    CAST(count(*) - sum(died) AS BIGINT) AS censored
         |  FROM lab GROUP BY 1),
         |r AS (
         |  SELECT *, CAST(sum(deaths + censored) OVER (ORDER BY dur DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS n_risk
         |  FROM hist),
         |arr AS (
         |  SELECT list(struct_pack(dur := dur, deaths := deaths,
         |    censored := censored, n_risk := n_risk) ORDER BY dur) AS a
         |  FROM r),
         |idx AS (SELECT unnest(range(1, len(a) + 1)) AS i, a FROM arr)
         |SELECT a[i].dur AS duration_days, a[i].n_risk AS n_risk,
         |  a[i].deaths AS deaths, a[i].censored AS censored,
         |  round(list_reduce(
         |    list_prepend(CAST(1.0 AS DOUBLE), list_transform(a[1:i],
         |      x -> CAST(x.n_risk - x.deaths AS DOUBLE)
         |           / CAST(x.n_risk AS DOUBLE))),
         |    (p, q) -> p * q), 6) AS survival
         |FROM idx ORDER BY duration_days""".stripMargin,

    "ev_ltv" ->
      """WITH uw AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS w,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS wc
        |  FROM events GROUP BY 1, 2),
        |a AS (
        |  SELECT user_id, w, wc, min(w) OVER (PARTITION BY user_id) AS cw
        |  FROM uw),
        |curve AS (
        |  SELECT cw, w - cw AS age, CAST(sum(wc) AS BIGINT) AS rev_c,
        |    count(*) AS active_users
        |  FROM a GROUP BY 1, 2),
        |sz AS (SELECT cw, count(*) AS cohort_users FROM a WHERE w = cw
        |       GROUP BY 1),
        |c2 AS (
        |  SELECT cw, age, cohort_users, active_users, rev_c,
        |    CAST(sum(rev_c) OVER (PARTITION BY cw ORDER BY age
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_c
        |  FROM curve JOIN sz USING (cw))
        |SELECT CAST(make_timestamp(cw * 604800000000) AS DATE) AS week_start,
        |  age AS age_week, cohort_users, active_users,
        |  round(CAST(rev_c AS DOUBLE) / 100.0, 6) AS rev,
        |  round(CAST(cum_c AS DOUBLE) / 100.0, 6) AS cum_rev,
        |  round(CAST(cum_c AS DOUBLE) / 100.0 / cohort_users, 6)
        |    AS cum_rev_per_user
        |FROM c2 ORDER BY week_start, age_week""".stripMargin,

    "ev_retention" ->
      """WITH per AS (
        |  SELECT user_id, min(day) AS d0, list(DISTINCT day) AS days
        |  FROM (SELECT user_id, CAST(ts AS DATE) AS day FROM events)
        |  GROUP BY user_id),
        |ex AS (SELECT d0 AS cohort_day,
        |              date_diff('day', d0, unnest(days)) AS day_offset
        |       FROM per),
        |c AS (SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
        |             count(*) AS users
        |      FROM ex WHERE day_offset BETWEEN 0 AND 7 GROUP BY 1, 2),
        |b AS (SELECT cohort_day, users AS n0 FROM c WHERE day_offset = 0)
        |SELECT c.cohort_day, c.day_offset, c.users,
        |  round(CAST(c.users AS DOUBLE) / b.n0, 6) AS retention
        |FROM c JOIN b USING (cohort_day)
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "ev_attribution" ->
      """SELECT user_id, event_id, ts AS purchase_ts,
        |  CASE WHEN last_click >= ts - INTERVAL 7 DAY THEN last_click END
        |    AS attributed_click_ts
        |FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |    max(CASE WHEN event_type = 'click' THEN ts END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_click
        |  FROM events WHERE event_type IN ('click', 'purchase'))
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,

    "ev_cohort" ->
      """WITH cohort AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM events GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week FROM events)
        |SELECT c.cohort_week,
        |  CAST(date_diff('day', c.cohort_week, a.act_week) // 7 AS BIGINT) AS week_offset,
        |  count(DISTINCT a.user_id) AS users
        |FROM active a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY c.cohort_week, week_offset
        |ORDER BY c.cohort_week, week_offset""".stripMargin,

    "ev_twa" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    CAST(round(value * 100, 0) AS BIGINT) AS v
        |  FROM events),
        |d AS (
        |  SELECT event_type, v,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dur
        |  FROM e)
        |SELECT event_type, count(*) AS n_intervals,
        |  round(CAST(sum(CAST(v AS HUGEINT) * dur) AS DOUBLE)
        |          / CAST(sum(dur) AS DOUBLE) / 100.0, 6)
        |    AS twa_value
        |FROM d WHERE dur IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Same MINSTD uniform + shared-literal Poisson(1) inverse-CDF branch
    // table; list folds ride the sorted means list (the ir_mrr ordered-
    // reduction discipline), bracket indices are 1-based on both engines.
    "ev_bootstrap_ci" ->
      s"""WITH base AS (
         |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
         |    ${graft.Exact.hash32Sql("CAST(event_id AS VARCHAR)")}
         |      % 2147483647 AS h
         |  FROM events),
         |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(c) AS BIGINT) AS sc FROM base GROUP BY 1),
         |ex AS (
         |  SELECT event_type, c, h, b
         |  FROM base CROSS JOIN
         |    (SELECT unnest(generate_series(0, 199)) AS b) bs),
         |wgt AS (
         |  SELECT event_type, b, c,
         |    CASE WHEN u < 0.36787944117144233 THEN 0
         |         WHEN u < 0.7357588823428847 THEN 1
         |         WHEN u < 0.9196986029286058 THEN 2
         |         WHEN u < 0.9810118431238463 THEN 3
         |         WHEN u < 0.9963401531726563 THEN 4
         |         WHEN u < 0.9994058151824183 THEN 5
         |         ELSE 6 END AS w
         |  FROM (SELECT *,
         |          (CAST((h * ((b * 2654435761) % 2147483647 + 1))
         |             % 2147483647 AS DOUBLE) + 0.5) / 2147483647.0 AS u
         |        FROM ex)),
         |rs AS (SELECT event_type, b, CAST(sum(w) AS BIGINT) AS sw,
         |         CAST(sum(w * c) AS BIGINT) AS swx
         |       FROM wgt GROUP BY 1, 2),
         |mbv AS (SELECT event_type,
         |          CASE WHEN sw > 0 THEN CAST(swx AS DOUBLE)
         |            / (100.0 * CAST(sw AS DOUBLE)) ELSE 0.0 END AS mb
         |        FROM rs),
         |ar AS (SELECT event_type, list(mb ORDER BY mb) AS arr
         |       FROM mbv GROUP BY 1),
         |st AS (SELECT event_type, arr, list_sum(arr) / 200.0 AS mbar
         |       FROM ar)
         |SELECT st.event_type, n,
         |  round(CAST(sc AS DOUBLE) / (100.0 * CAST(n AS DOUBLE)), 6)
         |    AS mean_val,
         |  round(arr[5], 6) AS ci_lo,
         |  round(arr[195], 6) AS ci_hi,
         |  round(sqrt(list_sum(list_transform(arr,
         |      x -> (x - mbar) * (x - mbar))) / 199.0), 6) AS boot_se
         |FROM st JOIN pt ON st.event_type = pt.event_type
         |ORDER BY st.event_type""".stripMargin,

    "ev_ab_test" -> {
      val h = graft.Exact.hash32Sql("CAST(user_id AS VARCHAR)")
      s"""WITH pu AS (
         |  SELECT user_id,
         |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pc
         |  FROM events GROUP BY user_id),
         |tot AS (SELECT count(*) AS nu, sum(pc) AS tp FROM pu),
         |u AS (
         |  SELECT user_id,
         |    CAST(pc * nu >= tp AS INT) AS conv,
         |    ($h % 2 = 0) AS va
         |  FROM pu CROSS JOIN tot),
         |s AS (
         |  SELECT
         |    sum(CASE WHEN va THEN 1 ELSE 0 END) AS n_a,
         |    sum(CASE WHEN NOT va THEN 1 ELSE 0 END) AS n_b,
         |    sum(CASE WHEN va THEN conv ELSE 0 END) AS c_a,
         |    sum(CASE WHEN NOT va THEN conv ELSE 0 END) AS c_b
         |  FROM u)
         |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         |  CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
         |  round(c_a / nullif(n_a, 0), 6) AS rate_a,
         |  round(c_b / nullif(n_b, 0), 6) AS rate_b,
         |  round((c_a / nullif(n_a, 0) - c_b / nullif(n_b, 0)) /
         |    sqrt(((c_a + c_b) / nullif(n_a + n_b, 0)) *
         |         (1.0 - (c_a + c_b) / nullif(n_a + n_b, 0)) *
         |         (1.0 / nullif(n_a, 0) + 1.0 / nullif(n_b, 0))), 6) AS z_score
         |FROM s""".stripMargin
    })
}
