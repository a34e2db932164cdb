package graft

import org.apache.spark.sql.catalyst.expressions.RegExpReplace
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextClean

/** The SparkSessionExtensions showcase (SURVEY.md §4): proves the injected
  * [[graft.plans.CollapseRegexpReplace]] optimizer rule (a) is actually
  * installed in the shared session, (b) fires exactly once on
  * `x_clean_text`'s plan (URL + punct layers fuse; `\b`-anchored and
  * non-deleting layers refuse), and (c) changes no answers — equivalence is
  * checked against a DRIVER-side java.util.regex sequential reference, the
  * same engine family but applied un-fused, so a wrong fusion cannot cancel
  * out.
  */
class RegexCollapseSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  /** All RegExpReplace expressions anywhere in the optimized plan. */
  private def rrNodes(df: org.apache.spark.sql.DataFrame): Seq[RegExpReplace] =
    df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.flatMap(_.collect { case r: RegExpReplace => r })
    }.flatten

  /** The un-fused chain, applied driver-side: lower → strip URLs → strip
    * punct → strip stops → collapse ws → trim, each a separate pass exactly
    * as TextClean.clean is written. */
  private def referenceClean(s: String): String =
    s.toLowerCase
      .replaceAll(TextClean.UrlRe, "")
      .replaceAll(TextClean.PunctRe, "")
      .replaceAll(TextClean.StopRe, "")
      .replaceAll(TextClean.WsRe, " ")
      .trim

  test("rule is injected and fires once: 4 replace layers optimize to 3") {
    val df = SparkEntry.queries("x_clean_text")(spark, dir)
    val nodes = rrNodes(df)
    assert(nodes.size == 3, s"expected 3 RegExpReplace after fusion, got " +
      s"${nodes.size}: ${nodes.map(_.regexp).mkString("; ")}")
    val patterns = nodes.map(_.regexp.toString)
    assert(patterns.exists(_ == s"(?:${TextClean.UrlRe})|(?:${TextClean.PunctRe})"),
      s"fused URL|punct pattern missing from $patterns")
    // the layers the guard must refuse are still present, un-fused
    assert(patterns.exists(_.contains("\\b")), "stop-phrase layer vanished")
    assert(patterns.contains(TextClean.WsRe), "whitespace layer vanished")
  }

  test("fusion changes no answers on the real corpus") {
    import graft.operators.ScalarFns.{EdgePrefix, EdgeSuffix}
    val got = SparkEntry.queries("x_clean_text")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        referenceClean(EdgePrefix + r.getString(1) + EdgeSuffix)).toMap
    assert(got.size == want.size)
    for ((id, w) <- want) assert(got(id) == w, s"doc $id diverged")
  }

  test("fusion is exact on adversarial edge strings") {
    // strings chosen to break a naive fusion: punct adjacent to URLs (the
    // class char is consumed by \S+ in one order only if matching is
    // position-faithful), URL at string edges, punct-only, stop words
    // manufactured by punct deletion (don't → dont — which the NEXT,
    // un-fused layer must still see).
    val tricky = Seq(
      "don't stop me", "(http://x.com).", ".http://a b", "!!!",
      "www.x.y?q=1,2 end", "a,b.c;d", "https://e.f Don'T tHiS",
      " http://x ", "no urls just-text", "'ve've this")
    // repartition is a barrier ConvertToLocalRelation cannot fold through —
    // without it the whole projection const-folds away and there is no plan
    // left to inspect
    val df = spark.createDataFrame(tricky.zipWithIndex.map(_.swap))
      .toDF("id", "s").repartition(2)
      .select(col("id"), TextClean.clean(col("s")).as("c"))
    // plan proof: the fused pattern is in THIS plan too
    assert(rrNodes(df).size == 3)
    val got = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    tricky.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) == referenceClean(s), s"edge string '$s' diverged")
    }
  }

  test("guard refuses unsound fusions") {
    // Outer pattern carries \b: fusing would change answers (deleting ' from
    // don't manufactures a \bdont\b match only a SECOND pass can see).
    val twoPass = regexp_replace(
      regexp_replace(col("s"), TextClean.PunctRe, ""), "(?i)\\bdont\\b", "")
    val df = spark.createDataFrame(Seq((0, "don't"))).toDF("id", "s")
      .repartition(2).select(twoPass.as("c"))
    assert(rrNodes(df).size == 2, "rule fused across a \\b assertion")
    assert(df.collect().head.getString(0) == "",
      "two-pass semantics broken: punct strip must expose the stop word")
    // Non-empty replacement: not a deletion, must refuse.
    val repl = regexp_replace(
      regexp_replace(col("s"), "a+", "-"), "[b]", "")
    val df2 = spark.createDataFrame(Seq((0, "aabb"))).toDF("id", "s")
      .repartition(2).select(repl.as("c"))
    assert(rrNodes(df2).size == 2, "rule fused a non-deletion layer")
  }
}
