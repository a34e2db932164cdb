package graft

import graft.functions.VaderSentiment.{compound, label}
import org.scalatest.funsuite.AnyFunSuite

class VaderSpec extends AnyFunSuite {

  test("clearly positive / negative / neutral sentences") {
    assert(label(compound("this coffee is great")) == "positive")
    assert(label(compound("this coffee is terrible")) == "negative")
    assert(label(compound("the table has four legs")) == "neutral")
  }

  test("compound is bounded in [-1, 1]") {
    val texts = Seq("great great great great great!!!!", "worst worst worst worst!!!!", "")
    texts.foreach(t => assert(math.abs(compound(t)) <= 1.0))
  }

  test("booster amplifies magnitude") {
    assert(compound("very good") > compound("good"))
    assert(compound("extremely bad") < compound("bad"))
    // dampener shrinks
    assert(compound("slightly good") < compound("good"))
  }

  test("negation flips polarity") {
    assert(compound("good") > 0.05)
    assert(compound("not good") < 0)
    assert(compound("not bad") > 0)
  }

  test("ALL-CAPS emphasis in mixed-case text") {
    assert(compound("this is GREAT coffee") > compound("this is great coffee"))
    // all-caps text gets no differential emphasis
    assert(compound("GREAT COFFEE") == compound("great coffee"))
  }

  test("exclamation emphasis") {
    assert(compound("good!") > compound("good"))
    assert(compound("bad!") < compound("bad"))
    // capped at 4 bangs
    assert(compound("good!!!!") == compound("good!!!!!!!!"))
  }

  test("but-clause pivots toward the later clause") {
    assert(compound("the food was good but the service was terrible") < 0)
    assert(compound("the service was terrible but the food was good") > 0)
  }

  test("label thresholds are exactly ±0.05 exclusive") {
    assert(label(0.05) == "neutral")
    assert(label(-0.05) == "neutral")
    assert(label(0.050001) == "positive")
    assert(label(-0.050001) == "negative")
  }

  test("null / empty / whitespace inputs score 0.0") {
    assert(compound(null) == 0.0)
    assert(compound("") == 0.0)
    assert(compound("   ") == 0.0)
  }

  test("scorer is pure (same input → same output)") {
    val t = "really not a very good day, but GREAT coffee!!"
    assert(compound(t) == compound(t))
  }

  test("negators that are themselves lexicon entries still flip ('no good')") {
    // 'no' carries its own negative valence AND acts as a negator: "no good"
    // must come out negative (1.9·(−0.74) − 1.2), not positive (1.9 − 1.2).
    assert(compound("no good") < 0)
    assert(label(compound("there is no good reason")) == "negative")
    assert(compound("nope bad") > compound("bad")) // flip weakens the negative
  }

  test("resource lexicon loads and preserves the embedded subset verbatim") {
    import graft.functions.VaderSentiment.{EmbeddedLexicon, Lexicon}
    assert(Lexicon.size > 800, s"expected bundled lexicon, got ${Lexicon.size} entries")
    EmbeddedLexicon.foreach { case (w, v) =>
      assert(Lexicon.get(w).contains(v), s"resource diverges from embedded at '$w'")
    }
    // spot-check extended coverage outside the embedded subset
    assert(label(compound("what a magnificent view")) == "positive")
    assert(label(compound("the weather was dreadful")) == "negative")
    assert(compound("an outstanding achievement") > 0.05)
    assert(compound("a devastating tragedy") < -0.05)
  }
}
