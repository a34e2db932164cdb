package graft

import graft.functions.TextClean
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

class TextCleanSpec extends AnyFunSuite {


  private lazy val spark = SparkTestBase.spark

  private def clean(inputs: String*): Seq[String] = {
    import spark.implicits._
    inputs.toDF("t").select(TextClean.clean(col("t")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("lowercases, strips URLs / punctuation / stop tokens, collapses whitespace") {
    assert(clean("Check HTTP://Example.com/a?b=1 now") == Seq("check now"))
    assert(clean("see www.foo.bar today") == Seq("see today"))
    assert(clean("a.b,c;d!e?f") == Seq("abcdef"))
    // 'just', 'really', 'think', 'this', 'like' are all in the 23-token stop list
    assert(clean("I just really think this is like fine") == Seq("i is fine"))
    assert(clean("  many   spaces\tand\ntabs  ") == Seq("many spaces and tabs"))
    assert(clean("MiXeD CaSe") == Seq("mixed case"))
  }

  test("exact python string.punctuation char class is removed") {
    val punct = """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""
    assert(clean(s"a${punct}b") == Seq("ab"))
  }

  test("stop tokens are word-bounded (no substring hits)") {
    // 'this' is a stop token but 'thistle' must survive
    assert(clean("thistle this") == Seq("thistle"))
    // 'st' is a stop token; 'street' survives
    assert(clean("st street") == Seq("street"))
  }

  test("property: clean converges after one pass on punct-free input, two passes otherwise") {
    // clean is NOT strictly idempotent: punctuation removal can synthesize
    // URL prefixes ("ht.tpx" -> "httpx", which the NEXT pass strips as a
    // URL). The reference applies the chain once, so this is its semantics,
    // not a bug. After one pass the output is punctuation-free, and on
    // punct-free input a clean pass only deletes whole URL spans and
    // word-bounded stop tokens — so the second application is a fixed point.
    val wordChars = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', '!', '?', ',', '\t'),
      1 -> Gen.oneOf('#', '@', '[', ']', '{', '}'))).map(_.mkString)
    val samples = Iterator.continually(wordChars.sample).flatten.take(40).toSeq
    val twice = clean(clean(samples: _*): _*)
    val thrice = clean(twice: _*)
    assert(thrice == twice)
    // and strict idempotence DOES hold for inputs with no punctuation
    val punctFree = samples.map(_.filterNot(c => "!?.,#@[]{}".contains(c)))
    val once = clean(punctFree: _*)
    assert(clean(once: _*) == once)
  }

  test("property: output never contains punctuation or uppercase") {
    val g = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaChar, 1 -> Gen.oneOf('!', '.', 'Q', 'Z', ' '))).map(_.mkString)
    val samples = Iterator.continually(g.sample).flatten.take(40).toSeq
    clean(samples: _*).foreach { out =>
      assert(!out.exists(c => "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".contains(c)))
      assert(!out.exists(_.isUpper))
    }
  }

  test("ISO-8601 formatting matches the reference's Z-suffix shape") {
    import spark.implicits._
    val got = Seq("2024-03-01 12:34:56.789").toDF("s")
      .select(TextClean.toIso8601(col("s").cast("timestamp")).as("iso"))
      .collect().head.getString(0)
    assert(got == "2024-03-01T12:34:56Z")
  }
}
