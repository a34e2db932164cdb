package graft

import graft.functions.VectorFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFnsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("cosine of identical vectors is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 5.0f, 0.0f)))
      .toDF("a", "b")
      .select(VectorFns.cosine(
        VectorFns.asDouble(col("a")), VectorFns.asDouble(col("b"))).as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
  }

  test("hand-computed cosine") {
    import spark.implicits._
    val got = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(VectorFns.cosine(
        VectorFns.asDouble(col("a")), VectorFns.asDouble(col("b"))).as("c"))
      .collect().head.getDouble(0)
    // (3+8) / (sqrt(5)*sqrt(25))
    assert(math.abs(got - 11.0 / (math.sqrt(5) * math.sqrt(25))) < 1e-12)
  }

  test("shingles3: n-2 shingles, short docs yield empty array") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "").toDF("t")
      .select(VectorFns.shingles3(split(col("t"), " ")).as("sh"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
    assert(got(2).isEmpty)
  }
}
