package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the preference/agreement/DSIR curation ops.
  * Value-level correctness is the DuckDB oracle's job; these pin the
  * mathematical properties a user relies on that a hash match alone
  * doesn't state (probability normalization, interval containment,
  * disagreement bounds, selection monotonicity).
  */
class PreferenceSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("pref_bradley_terry: ranks are a permutation, scores normalize, " +
    "wins balance comparisons") {
    val out = operators.Preference.queries("pref_bradley_terry")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    val k = out.length
    assert(k >= 2, "need at least two competing event types")
    assert(out.map(_._5).sorted.toSeq == (1 to k), "ranks must be 1..K")
    // normalized strengths: Σp = 1 up to round(6) loss
    val ps = out.map(_._4)
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    assert(math.abs(ps.sum - 1.0) < 1e-4, s"sum(bt_score) = ${ps.sum}")
    // every comparison produces exactly one win: Σwins·2 = Σcomparisons
    assert(out.map(_._2).sum * 2 == out.map(_._3).sum)
    assert(out.forall(r => r._2 <= r._3), "wins cannot exceed comparisons")
    // rank order agrees with score order (ties broken by type asc)
    val byRank = out.sortBy(_._5).map(_._4)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("pref_pairwise_winrate: Wilson interval contains the rate, bounded in [0,1]") {
    val out = operators.Preference.queries("pref_pairwise_winrate")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.nonEmpty)
    out.foreach { case (a, b, wa, n, rate, lo, hi) =>
      assert(a < b, "pair key must be ordered")
      assert(wa >= 0 && wa <= n)
      assert(lo <= rate + 1e-6 && rate <= hi + 1e-6,
        s"($a,$b): Wilson [$lo,$hi] must contain $rate")
      assert(lo >= -1e-6 && hi <= 1.0 + 1e-6)
    }
    // pair totals must tie out to the BT comparison totals: Σn_cmp over
    // pairs == total comparisons == Σwins from the BT view
    val bt = operators.Preference.queries("pref_bradley_terry")(spark, dir)
      .agg(sum("wins")).collect()(0).getLong(0)
    assert(out.map(_._4).sum == bt)
  }

  test("agree_krippendorff: one row, bounded disagreements, coherent counts") {
    val out = operators.Preference.queries("agree_krippendorff")(spark, dir)
      .collect()
    assert(out.length == 1)
    val r = out(0)
    val (nUnits, nPairable, nRatings) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (dO, dE, alpha) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(nPairable <= nUnits)
    assert(nRatings >= 2 * nPairable, "each pairable unit has >= 2 ratings")
    assert(dO >= 0.0 && dO <= 1.0 + 1e-9, s"d_o = $dO")
    assert(dE > 0.0 && dE <= 1.0 + 1e-9, s"d_e = $dE")
    // alpha = 1 - dO/dE, recomputed from the emitted (rounded) parts
    assert(math.abs(alpha - (1.0 - dO / dE)) < 1e-4)
    assert(alpha <= 1.0)
  }

  test("samp_dsir: k selected, ranks contiguous, weights non-increasing, " +
    "selection skews toward the target language") {
    val out = operators.Preference.queries("samp_dsir")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.length == operators.Preference.DsirK)
    assert(out.map(_._4).toSeq == (1 to operators.Preference.DsirK))
    assert(out.forall(_._2 >= 1), "every selected doc has >= 1 bigram")
    val ws = out.sortBy(_._4).map(_._3)
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b - 1e-9 },
      "dsir_logw must be non-increasing in rank")
    // importance resampling toward lang='en' must over-represent it vs
    // the raw corpus share
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), (col("lang") === "en").cast("int").as("en"))
    val rawShare = docs.agg(avg("en")).collect()(0).getDouble(0)
    val selIds = out.map(_._1).toSeq
    val selShare = docs.where(col("doc_id").isin(selIds: _*))
      .agg(avg("en")).collect()(0).getDouble(0)
    assert(selShare > rawShare,
      s"DSIR top-k en-share $selShare must exceed corpus share $rawShare")
  }

  test("prof_kanon: risks monotone in k, shares bounded, counts coherent") {
    val out = operators.Relational3.queries("prof_kanon")(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    val (nDocs, nClasses) = (r.getLong(0), r.getLong(1))
    val (k2, k5, k10) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val (minC, maxC, minL) = (r.getLong(5), r.getLong(6), r.getLong(7))
    val l3 = r.getDouble(8)
    assert(nClasses >= 1 && nClasses <= nDocs)
    assert(k2 <= k5 + 1e-9 && k5 <= k10 + 1e-9, "risk shares monotone in k")
    assert(Seq(k2, k5, k10, l3).forall(x => x >= 0.0 && x <= 1.0 + 1e-9))
    assert(minC >= 1 && minC <= maxC && maxC <= nDocs)
    assert(minL >= 1)
  }

  test("ta_hdd: bounded in (0,1], only docs above the validity floor") {
    val out = operators.TextAnalysis.queries("ta_hdd")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (id, n, types, hdd) =>
      assert(n >= 50, s"doc $id below the 50-token floor")
      assert(types >= 1 && types <= n)
      assert(hdd > 0.0 && hdd <= 1.0 + 1e-9,
        s"doc $id: HD-D $hdd outside (0,1]")
    }
    // a doc whose every token is distinct would score exactly 1; more
    // repetition -> lower score, so corpus HD-D must sit strictly below
    // the all-distinct ceiling on this synthetic (repetitive) text
    assert(out.map(_._4).max < 1.0)
  }

  test("pref_copeland: tournament accounting closes, at most one Condorcet winner") {
    val out = operators.Preference.queries("pref_copeland")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val k = out.length
    assert(k >= 2)
    out.foreach { case (t, w, ti, l, cope, _) =>
      assert(w + ti + l == k - 1, s"$t: every opponent accounted once")
      assert(cope == w - l)
    }
    // majority wins across all types = majority losses across all types
    assert(out.map(_._2).sum == out.map(_._4).sum)
    assert(out.count(_._6) <= 1, "at most one Condorcet winner")
    // a Condorcet winner beats all K-1 opponents by definition
    out.filter(_._6).foreach { case (_, w, _, _, _, _) => assert(w == k - 1) }
  }

  test("agree_gwet_ac1: probabilities bounded, coefficient below 1") {
    val out = operators.Preference.queries("agree_gwet_ac1")(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    val (np, c) = (r.getLong(0), r.getLong(1))
    val (po, pe, ac1) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(np >= 1 && c >= 2)
    assert(po >= 0.0 && po <= 1.0 + 1e-9)
    assert(pe > 0.0 && pe < 1.0)
    assert(ac1 <= 1.0 + 1e-9)
    // AC1 recomposes from its emitted (rounded) parts
    assert(math.abs(ac1 - (po - pe) / (1.0 - pe)) < 1e-4)
  }

  test("dd_soft_weight: one row per doc, weights coherent, inverse mass = cluster count") {
    val out = operators.Dedup.queries("dd_soft_weight")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val nDocs = Tables.load(spark, dir, "documents").count()
    assert(out.length == nDocs, "soft dedup keeps every doc")
    out.foreach { case (id, copies, wInv, wSqrt) =>
      assert(copies >= 1)
      assert(wInv <= wSqrt + 1e-9 && wSqrt <= 1.0 + 1e-9, s"doc $id")
      if (copies == 1) assert(wInv == 1.0 && wSqrt == 1.0)
    }
    // sum of 1/copies over docs == number of unique-content clusters
    val nClusters = operators.Dedup.queries("dd_exact")(spark, dir).count()
    assert(math.abs(out.map(_._3).sum - nClusters) < 1e-3,
      "inverse-weight mass must equal the cluster count")
  }
}
