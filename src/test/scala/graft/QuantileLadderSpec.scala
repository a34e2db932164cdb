package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the shared bucket-then-refine order-statistic ladder
  * (`plans/QuantileLadder`, under ev_rfm / ev_decile_lift): whatever the
  * value distribution — duplicates, negatives, constant columns, wide
  * gaps that stress the adaptive bucket width — `orderStats` must return
  * EXACTLY the r-th smallest element (the definitional
  * sorted-sequence answer), at every requested rank, on multi-partition
  * input. This is the brute-force equivalence the battery oracle checks
  * only at the specific quintile/decile ranks the queries use.
  */
class QuantileLadderSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def check(xs: Seq[Long], ranks: Seq[Long]): Unit = {
    import spark.implicits._
    val values = xs.toDF("x").repartition(7) // force multi-partition
    val targets = ranks.zipWithIndex
      .map { case (r, i) => (i.toLong, r) }.toDF("k", "r")
    val got = graft.plans.QuantileLadder.orderStats(values, "x", targets)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sorted = xs.sorted
    for (((r, i)) <- ranks.zipWithIndex) {
      assert(got.contains(i.toLong), s"rank $r (tag $i) missing from result")
      assert(got(i.toLong) == sorted((r - 1).toInt),
        s"rank $r: ladder ${got(i.toLong)} != brute ${sorted((r - 1).toInt)} " +
          s"(n=${xs.length})")
    }
  }

  test("property: ladder equals the sorted-sequence order statistic") {
    val gen = for {
      n <- Gen.choose(1, 400)
      // mixture: tight clusters (bucket collisions), huge outliers
      // (adaptive width stress), negatives (x - lo arithmetic)
      xs <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.choose(-50L, 50L),
        3 -> Gen.choose(-5L, 5L).map(_ * 1000000007L),
        1 -> Gen.oneOf(Long.MinValue / 4, Long.MaxValue / 4),
        1 -> Gen.const(42L)))
    } yield xs
    val cases = Iterator.continually(gen.sample).flatten.take(12).toSeq
    for (xs <- cases) {
      val n = xs.length.toLong
      val ranks = Seq(1L, (n + 1) / 2, n) ++
        (1 to 4).map(k => (k * n + 4) / 5) // the ev_rfm quintile ranks
      check(xs, ranks.distinct)
    }
  }

  test("constant column and single row degenerate cleanly") {
    check(Seq.fill(100)(7L), Seq(1L, 50L, 100L))
    check(Seq(-3L), Seq(1L))
  }
}
