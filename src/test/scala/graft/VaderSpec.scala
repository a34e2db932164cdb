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

  test("special-case idioms override the anchor word's valence") {
    // "bomb" is −2.2 alone, but "the bomb" is praise (+3.0)
    assert(compound("this party is the bomb") > 0.05)
    assert(compound("a bomb went off") < -0.05)
    // "broken heart" (−2.9) fires via the right-side window of "broken"
    assert(compound("she has a broken heart") < compound("she has a broken phone"))
    // "kiss of death" (−1.5) fires via the 3-gram ending at "death"
    assert(label(compound("that decision was the kiss of death")) == "negative")
    // "yeah right" (−2.0) is sarcasm, not agreement
    assert(compound("yeah right") < 0 && compound("yeah") > 0)
  }

  test("multi-word dampeners hedge toward zero") {
    assert(compound("kind of good") < compound("good"))
    assert(compound("kind of good") > 0)
    // sign-aware: "sort of bad" hedges toward zero, never intensifies
    assert(compound("sort of bad") > compound("bad"))
    assert(compound("sort of bad") < 0)
    // "kind of" must not fire the kindness lexicon entry for "kind"
    assert(compound("kind of ok") < compound("kind ok"))
  }

  test("negation exceptions: 'never so/this' intensifies, 'without doubt' affirms") {
    assert(compound("never so happy") > compound("happy"))
    assert(compound("never this excited") > compound("excited"))
    assert(compound("never happy") < 0) // plain negation still flips
    assert(compound("without doubt excellent") > 0.05)
    assert(compound("without merit excellent") < compound("excellent")) // other 'without' still negates
  }

  test("'least' de-intensifies except in 'at least' / 'very least'") {
    assert(compound("the least interesting talk") < compound("an interesting talk"))
    assert(compound("at least good") > 0)
    assert(compound("least good") < 0)
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

  test("round-4 lexicon batches: curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon.size == 7524, s"lexicon entry count drifted: ${Lexicon.size}")
    // exact pinned values for the batch's anchors
    assert(Lexicon("shit") == -2.6 && Lexicon("scam") == -2.2)
    assert(Lexicon("stellar") == 2.7 && Lexicon("blissful") == 2.9)
    // label-level goldens across the batch
    assert(label(compound("that deal was a total scam")) == "negative")
    assert(label(compound("an absolutely stellar performance")) == "positive")
    assert(label(compound("the meeting was tedious and monotonous")) == "negative")
    assert(label(compound("a cozy and serene cabin")) == "positive")
    assert(label(compound("his excruciating and unbearable commute")) == "negative")
    assert(label(compound("she is a gifted and dependable friend")) == "positive")
    // the new "shit" anchor lets the "the shit" idiom fire (praise)
    assert(compound("this mixtape is the shit") > 0.05)
    assert(compound("this mixtape is shit") < -0.05)
    // second batch (77 entries, common-word gap fill): exact anchors
    assert(Lexicon("catastrophe") == -3.4 && Lexicon("devastate") == -3.2)
    assert(Lexicon("triumph") == 2.4 && Lexicon("glee") == 2.9)
    // label-level goldens across the second batch
    assert(label(compound("the launch was a complete catastrophe")) == "negative")
    assert(label(compound("a triumph of innovative engineering")) == "positive")
    assert(label(compound("they tried to trap and deceive us")) == "negative")
    assert(label(compound("a sunny day full of glee and harmony")) == "positive")
    assert(label(compound("his arrogant and vulgar remarks")) == "negative")
    assert(label(compound("grateful for such a wholesome and useful gift")) == "positive")
    // negation still inverts batch words through the scorer
    assert(label(compound("this was not useful at all")) == "negative")
    // third batch (122 entries): exact anchors + label goldens
    assert(Lexicon("jubilant") == 2.8 && Lexicon("abysmal") == -2.8)
    assert(Lexicon("wretched") == -2.5 && Lexicon("majestic") == 2.3)
    assert(label(compound("a jubilant crowd welcomed the valiant team")) == "positive")
    assert(label(compound("an abysmal and forgettable performance")) == "negative")
    assert(label(compound("the service was courteous and the food immaculate")) == "positive")
    assert(label(compound("a treacherous and malicious betrayal")) == "negative")
    assert(label(compound("CAPS intensify: this is ABYSMAL")) == "negative")
  }

  test("round-5 lexicon batch (126 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    // exact pinned anchors across the valence range
    assert(Lexicon("euphoria") == 3.0 && Lexicon("overjoyed") == 3.0)
    assert(Lexicon("wrath") == -2.7 && Lexicon("terrify") == -2.7)
    assert(Lexicon("rigorous") == 0.8 && Lexicon("subdue") == -0.9)
    // derived forms stay consistent with their bundled relatives
    assert(math.abs(Lexicon("adored") - Lexicon("adore")) <= 0.3)
    assert(math.abs(Lexicon("terrify") - Lexicon("terrified")) <= 0.3)
    assert(math.abs(Lexicon("thrive") - Lexicon("thriving")) <= 0.3)
    // label-level goldens across the batch
    assert(label(compound("a caring and considerate host")) == "positive")
    assert(label(compound("the audit was an excruciating ordeal")) == "negative")
    assert(label(compound("they tried to manipulate and mislead the jury")) == "negative")
    assert(label(compound("an ingenious and dazzling solution")) == "positive")
    assert(label(compound("his vengeful wrath ravaged the village")) == "negative")
    assert(label(compound("we persevere and thrive together")) == "positive")
    // modulation still applies to batch words
    assert(compound("extremely hurtful words") < compound("hurtful words"))
    assert(label(compound("this was not hurtful")) == "positive")
  }

  test("round-5 lexicon batch 2 (131 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("atrocity") == -3.1 && Lexicon("brutality") == -3.0)
    assert(Lexicon("brilliance") == 2.8 && Lexicon("elation") == 2.8)
    assert(Lexicon("cautious") == 0.4 && Lexicon("apology") == 0.6)
    // adverb/noun forms track their bundled roots
    assert(math.abs(Lexicon("bravely") - Lexicon("brave")) <= 0.3)
    assert(math.abs(Lexicon("dreadfully") - Lexicon("dreadful")) <= 0.3)
    assert(label(compound("an admirable and compassionate leader")) == "positive")
    assert(label(compound("the merger became a shameful debacle")) == "negative")
    assert(label(compound("her eloquent and enchanting keynote")) == "positive")
    assert(label(compound("their disloyal and distasteful scheme")) == "negative")
    assert(label(compound("a diligent engineer with exemplary endurance")) == "positive")
    assert(label(compound("he was fuming over the calamitous rollout")) == "negative")
  }

  test("round-5 lexicon batch 3 (98 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("hatred") == -3.2 && Lexicon("hellish") == -2.8)
    assert(Lexicon("heartwarming") == 2.6 && Lexicon("heroism") == 2.6)
    assert(Lexicon("lull") == -0.4 && Lexicon("lenient") == 0.7)
    assert(label(compound("a heartwarming act of generosity")) == "positive")
    assert(label(compound("his insolent and judgmental tone")) == "negative")
    assert(label(compound("an insightful and imaginative proposal")) == "positive")
    assert(label(compound("the rollout was a joyless hassle")) == "negative")
    assert(label(compound("her masterful and gracious keynote")) == "positive")
    assert(label(compound("consumed by hatred and mistrust")) == "negative")
  }

  test("round-5 lexicon batch 4 (234 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("perfection") == 2.7 && Lexicon("torturous") == -2.6)
    assert(Lexicon("serenity") == 2.4 && Lexicon("repugnant") == -2.5)
    assert(Lexicon("sacrifice") == -0.6 && Lexicon("scrappy") == 0.6)
    assert(label(compound("a selfless act of tremendous valor")) == "positive")
    assert(label(compound("the sickening stench of negligence")) == "negative")
    assert(label(compound("an uplifting and stimulating seminar")) == "positive")
    assert(label(compound("their underhanded and unethical tactics")) == "negative")
    assert(label(compound("a serene retreat of splendor and tranquility")) == "positive")
    assert(label(compound("he seethed over the slanderous taunt")) == "negative")
    // boosters and negation still compose with the new vocabulary
    assert(compound("incredibly uplifting news") > compound("uplifting news"))
    assert(label(compound("this was not wasteful at all")) == "positive")
  }

  test("property: scorer invariants hold across the whole lexicon") {
    import graft.functions.VaderSentiment.Lexicon
    // scorer-special tokens (negators, idiom members, modifiers) are
    // exempt — they trigger their own rules inside the test sentences
    val special = Set("no", "nope", "not", "never", "without", "least", "but",
      "kind", "sort", "bomb", "shit", "heart", "doubt")
    val words = Lexicon.keys.toVector.sorted
      .filter(w => w.forall(_.isLetter) && math.abs(Lexicon(w)) >= 0.5 &&
        !special.contains(w))
    // deterministic sample: every 17th word keeps the check fast but broad
    val sample = words.indices.collect { case i if i % 17 == 0 => words(i) }
    sample.foreach { w =>
      val v = Lexicon(w)
      val base = compound(s"the service was $w")
      // 1. sign of a single-bearing-word sentence matches the lexicon sign
      assert(base.sign == v.sign || base == 0.0, s"'$w': sign flip ($v -> $base)")
      // 2. negation inverts the direction
      val neg = compound(s"the service was not $w")
      assert(neg == 0.0 || neg.sign == -v.sign, s"'$w': negation failed ($base -> $neg)")
      // 3. boosters move the score away from zero
      val boosted = compound(s"the service was extremely $w")
      assert(math.abs(boosted) >= math.abs(base) - 1e-9, s"'$w': booster weakened")
      // 4. bounded output
      assert(math.abs(base) <= 1.0 && math.abs(boosted) <= 1.0)
    }
    assert(sample.size > 90, s"property sample too small: ${sample.size}")
  }

  test("round-5 lexicon batch 5 (119 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("betrayal") == -2.8 && Lexicon("abominable") == -2.8)
    assert(Lexicon("blissfulness") == 2.8 && Lexicon("cherished") == 2.4)
    assert(Lexicon("bravado") == -0.6 && Lexicon("contrite") == 0.6)
    assert(label(compound("a chivalrous act of benevolence")) == "positive")
    assert(label(compound("their dastardly betrayal left him brokenhearted")) == "negative")
    assert(label(compound("an articulate and conscientious mentor")) == "positive")
    assert(label(compound("the cantankerous critic chose to denigrate everyone")) == "negative")
    assert(label(compound("a convivial evening of camaraderie and candor")) == "positive")
    assert(label(compound("morale continued to deteriorate into despondency")) == "negative")
  }

  test("round-5 lexicon batch 6 (93 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("euphoric") == 2.9 && Lexicon("excruciatingly") == -2.7)
    assert(Lexicon("exhilarating") == 2.6 && Lexicon("enslave") == -2.6)
    assert(Lexicon("grandiose") == -0.6 && Lexicon("frugal") == 0.8)
    assert(label(compound("an effortless and exquisitely crafted tool")) == "positive")
    assert(label(compound("the rollout was excruciatingly fraught with glitches")) == "negative")
    assert(label(compound("a fruitful quarter of flourishing goodwill")) == "positive")
    assert(label(compound("his egotistical gloating and graceless gaffes")) == "negative")
  }

  test("round-5 lexicon batch 7 (115 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("heinous") == -2.9 && Lexicon("horrendously") == -2.8)
    assert(Lexicon("heroically") == 2.3 && Lexicon("impeccably") == 2.3)
    assert(Lexicon("hype") == -0.4 && Lexicon("innocuous") == 0.6)
    assert(label(compound("a hospitable haven run harmoniously")) == "positive")
    assert(label(compound("their heinous hypocrisy wreaked havoc")) == "negative")
    assert(label(compound("an industrious and intrepid crew")) == "positive")
    assert(label(compound("the irate customer decried the inexcusable incompetence")) == "negative")
  }

  test("round-5 lexicon batch 8 (90 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("jubilation") == 2.8 && Lexicon("loathsome") == -2.5)
    assert(Lexicon("marvelously") == 2.6 && Lexicon("malignant") == -2.4)
    assert(Lexicon("mystify") == -0.6 && Lexicon("morale") == 1.0)
    assert(label(compound("a jovial and kindhearted mentor")) == "positive")
    assert(label(compound("the manipulative leech maligned his rivals")) == "negative")
    assert(label(compound("she spoke marvelously of their meticulous work")) == "positive")
    assert(label(compound("a lamentable meltdown mishandled at every turn")) == "negative")
  }

  test("round-5 lexicon batch 9 (109 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("phenomenal") == 2.8 && Lexicon("putrid") == -2.4)
    assert(Lexicon("overjoy") == 2.6 && Lexicon("persecution") == -2.4)
    assert(Lexicon("nonchalant") == -0.4 && Lexicon("prim") == 0.5)
    assert(label(compound("a phenomenal and personable speaker")) == "positive")
    assert(label(compound("their nefarious scheme obliterated all goodwill")) == "negative")
    assert(label(compound("a picturesque village at the pinnacle of charm")) == "positive")
    assert(label(compound("the noxious spill left the river polluted")) == "negative")
  }

  test("round-5 lexicon batch 10 (140 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("terrorize") == -2.9 && Lexicon("stupendous") == 2.6)
    assert(Lexicon("rapturous") == 2.6 && Lexicon("reprehensible") == -2.5)
    assert(Lexicon("uncanny") == 0.5 && Lexicon("voracious") == -0.6)
    assert(label(compound("a stupendous and warmhearted celebration")) == "positive")
    assert(label(compound("their unscrupulous cronies vandalized the sanctuary")) == "negative")
    assert(label(compound("the team performed superbly and seamlessly")) == "positive")
    assert(label(compound("a ruinous spiral of rancor and toxicity")) == "negative")
  }

  test("round-6 lexicon batch 14 (68 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("carnage") == -3.0 && Lexicon("altruism") == 2.4)
    assert(Lexicon("abhorrence") == -2.9 && Lexicon("accolade") == 2.3)
    assert(Lexicon("aloof") == -0.7 && Lexicon("agile") == 1.2)
    assert(Lexicon("contemptible") == -2.2 && Lexicon("cuddle") == 2.0)
    assert(label(compound("an acclaimed speech met with every accolade")) == "positive")
    assert(label(compound("the ambush left carnage and bereavement behind")) == "negative")
    assert(label(compound("her altruism will befriend the whole amnesty board")) == "positive")
    assert(label(compound("a conceited and condescending antagonist")) == "negative")
    // negation still inverts batch words through the scorer
    assert(compound("not agile at all") < 0)
  }

  test("round-6 lexicon batch 15 (83 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("diabolical") == -2.5 && Lexicon("ebullient") == 2.2)
    assert(Lexicon("dehumanize") == -2.3 && Lexicon("empathetic") == 1.9)
    assert(Lexicon("fleeting") == -0.4 && Lexicon("dynamic") == 1.4)
    assert(Lexicon("duplicity") == -2.0 && Lexicon("delectable") == 2.0)
    assert(label(compound("an ebullient and effervescent host with real decency")) == "positive")
    assert(label(compound("a diabolical scheme to defraud and dehumanize them")) == "negative")
    assert(label(compound("the enchanted crowd found her enthralling")) == "positive")
    assert(label(compound("disgruntled tenants left the place in disrepair and disarray")) == "negative")
    // booster + batch word still compose
    assert(compound("absolutely delectable") > compound("delectable"))
  }

  test("round-6 lexicon batch 16 (43 entries): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("genocide") == -3.4 && Lexicon("irresistible") == 1.7)
    assert(Lexicon("inconsolable") == -2.3 && Lexicon("hearten") == 1.8)
    assert(Lexicon("gritty") == -0.4 && Lexicon("inquisitive") == 1.1)
    assert(label(compound("the heartening ingenuity of an inquisitive mind")) == "positive")
    assert(label(compound("a grotesque infestation left the ward inconsolable")) == "negative")
    assert(label(compound("their ingratitude and hypocritical indignation grate")) == "negative")
  }

  test("round-6 lexicon batch 17 (90 entries, informal/slang register): curated coverage goldens") {
    // The published lexicon's defining feature is social-media vocabulary
    // (Hutto & Gilbert 2014 §3.1 built it FOR microblog text) — exactly the
    // register a Reddit corpus is made of. This batch opens that front.
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("lol") == 1.6 && Lexicon("wtf") == -2.7)
    assert(Lexicon("stoked") == 2.2 && Lexicon("scumbag") == -2.6)
    assert(Lexicon("nah") == -0.4 && Lexicon("gg") == 1.4)
    assert(Lexicon("fml") == -2.6 && Lexicon("hooray") == 2.5)
    assert(label(compound("lol that set was kickass, totally stoked")) == "positive")
    assert(label(compound("ugh what a janky ripoff, fml")) == "negative")
    assert(label(compound("gg everyone, woohoo")) == "positive")
    assert(label(compound("that scumbag pulled a shoddy sham again")) == "negative")
    // ALL-CAPS emphasis applies to slang too (scorer is case-aware)
    assert(compound("this is KICKASS") > compound("this is kickass"))
  }

  test("round-6 lexicon batches 18-19 (83 entries, j-r gap fill): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("mutilate") == -2.7 && Lexicon("phenomenally") == 2.6)
    assert(Lexicon("nightmarish") == -2.6 && Lexicon("reverence") == 1.8)
    assert(Lexicon("lurk") == -1.0 && Lexicon("novel") == 1.0)
    assert(Lexicon("racist") == -2.8 && Lexicon("prevail") == 1.5)
    assert(label(compound("a remarkably prolific author held in reverence")) == "positive")
    assert(label(compound("nightmarish misconduct and premeditated mistreatment")) == "negative")
    assert(label(compound("justice will prevail over their rampage")) == "positive")
    assert(label(compound("livid about the misinformation and rudeness")) == "negative")
    // "least" de-emphasis still applies to batch words
    assert(compound("least nightmarish outcome") > compound("nightmarish outcome"))
  }

  test("round-6 lexicon batch 20 (85 entries, s-z gap fill): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("utopia") == 2.3 && Lexicon("treachery") == -2.4)
    assert(Lexicon("salvation") == 1.9 && Lexicon("sadistic") == -2.6)
    assert(Lexicon("suspense") == -0.4 && Lexicon("unscathed") == 1.0)
    assert(Lexicon("virtuoso") == 2.1 && Lexicon("warmonger") == -2.3)
    assert(label(compound("a virtuoso whose tenacity brought salvation")) == "positive")
    assert(label(compound("the tyranny and treachery of a sadistic warmonger")) == "negative")
    assert(label(compound("she emerged unscathed, full of vitality")) == "positive")
    assert(label(compound("their vendetta victimized the whole village")) == "negative")
    // but-pivot still reweights across batch words
    assert(compound("a shipwreck but everyone emerged unscathed") >
      compound("a shipwreck"))
  }

  test("round-6 lexicon batch 21 (50 entries, emoticons): curated coverage goldens") {
    // The published lexicon's most social-media-specific register: pure
    // punctuation emoticons (Hutto & Gilbert 2014 §3.1 Table 1 lists them
    // as a ground-truth category). Requires the words-plus-punctuation
    // tokenizer rule — a token that IS a lexicon entry is kept verbatim
    // instead of being stripped to "".
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon(":)") == 2.0 && Lexicon(":(") == -1.9)
    assert(Lexicon("<3") == 3.0 && Lexicon("</3") == -3.0)
    assert(Lexicon("xd") == 2.6 && Lexicon("-_-") == -1.1)
    assert(Lexicon(":'(") == -2.2 && Lexicon("^_^") == 1.5)
    // emoticons survive tokenization and carry sign on their own
    assert(compound(":)") > 0 && compound(":(") < 0)
    assert(compound("i <3 this band") > 0)
    assert(compound("server down again -_-") < 0)
    // they compose with words and with each other
    assert(label(compound("great set last night :)")) == "positive")
    assert(label(compound("they cancelled the show :( :(")) == "negative")
    assert(compound("good :)") > compound("good"))
    // negation reaches emoticons like any other lexicon token
    assert(compound("not :)") < 0)
    // mixed-case caps emphasis: ":D" uppercases the letter, ":d" doesn't
    assert(compound("that demo was :D impressive") >=
      compound("that demo was :d impressive"))
    // word tokens with trailing punctuation still strip (and "!"
    // amplification still applies on top, so strictly greater)
    assert(compound("good!!") > compound("good"))
  }

  test("round-6 lexicon batch 22 (47 entries, j/k/o/q/v/y/z gap fill): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("jackpot") == 2.6 && Lexicon("junkie") == -2.2)
    assert(Lexicon("kudos") == 2.3 && Lexicon("kidnapped") == -2.7)
    assert(Lexicon("oasis") == 1.8 && Lexicon("obliterated") == -2.5)
    assert(Lexicon("quench") == 1.2 && Lexicon("quitter") == -1.7)
    assert(Lexicon("visionary") == 2.1 && Lexicon("vomit") == -2.2)
    assert(Lexicon("zen") == 1.7 && Lexicon("zombie") == -1.2)
    assert(label(compound("kudos to the visionary duo, they hit the jackpot")) == "positive")
    assert(label(compound("the vandal yelled and left the vacant lot an ordeal")) == "negative")
    assert(label(compound("a kindred spirit with youthful zen and virtue")) == "positive")
    assert(label(compound("that quitter jinxed the whole jumpy crew")) == "negative")
    // booster + negation still compose across the new entries
    assert(compound("absolutely overjoyed, what a knockout") > compound("knockout"))
    assert(compound("not a knockout") < 0)
  }

  test("round-6 lexicon batch 23 (86 entries, inflections a-c): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("abandonment") == -2.4 && Lexicon("adores") == 2.6)
    assert(Lexicon("betrays") == -2.8 && Lexicon("brilliantly") == 2.8)
    assert(Lexicon("bullied") == -2.4 && Lexicon("celebrates") == 2.2)
    assert(Lexicon("corrupted") == -2.4 && Lexicon("cheerfully") == 2.3)
    assert(label(compound("she adores how brilliantly the chorus celebrates")) == "positive")
    assert(label(compound("he betrays and belittles whoever complains")) == "negative")
    assert(label(compound("the team cheerfully applauds every compliment")) == "positive")
    assert(label(compound("bullied, battered, and burdened by curses")) == "negative")
    // negation flips the new negative carriers into relief
    assert(compound("not aching anymore") > 0)
  }

  test("round-6 lexicon batch 24 (100 entries, inflections d-g): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("devastates") == -2.7 && Lexicon("dazzles") == 2.0)
    assert(Lexicon("enrages") == -2.6 && Lexicon("exhilarated") == 2.6)
    assert(Lexicon("fatalities") == -2.9 && Lexicon("flourishes") == 2.0)
    assert(Lexicon("grieves") == -2.2 && Lexicon("gloriously") == 2.7)
    assert(label(compound("the encore dazzles and the crowd is exhilarated")) == "positive")
    assert(label(compound("the scandal enrages donors and devastates trust")) == "negative")
    assert(label(compound("her career flourishes gloriously, generously mentored")) == "positive")
    assert(label(compound("he grieves the fatalities from the disasters")) == "negative")
    // "but"-pivot reweights across new entries
    assert(compound("the rollout fails but the team flourishes") >
      compound("the rollout fails"))
  }

  test("round-6 lexicon batch 25 (59 entries, inflections h-m): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("infuriates") == -2.6 && Lexicon("magnificently") == 2.8)
    assert(Lexicon("loathes") == -2.5 && Lexicon("improves") == 1.8)
    assert(Lexicon("murderous") == -3.0 && Lexicon("mesmerized") == 1.7)
    assert(Lexicon("humiliates") == -2.4 && Lexicon("kindhearted") == 2.4)
    assert(label(compound("the kindhearted mentor magnificently improves morale")) == "positive")
    assert(label(compound("the delay infuriates riders and humiliates the agency")) == "negative")
    assert(label(compound("mesmerized, the hall laughs and marvels joyfully")) == "positive")
    assert(label(compound("he loathes the merciless, murderous regime")) == "negative")
    // ALL-CAPS emphasis still applies to new entries in mixed-case text
    assert(compound("this INFURIATES me daily") < compound("this infuriates me daily"))
  }

  test("round-6 lexicon batch 26 (63 entries, inflections n-r): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("persecutes") == -2.4 && Lexicon("rejoices") == 2.5)
    assert(Lexicon("oppresses") == -2.3 && Lexicon("prospers") == 2.1)
    assert(Lexicon("ravages") == -2.4 && Lexicon("praises") == 2.1)
    assert(label(compound("the village prospers and rejoices as trade renews")) == "positive")
    assert(label(compound("the blight ravages crops and poisons the wells")) == "negative")
    assert(label(compound("she praises the crew that rescues and rebuilds")) == "positive")
    assert(label(compound("the regime persecutes critics and plunders ruthlessly")) == "negative")
    // idiom/negation machinery still composes with the new entries
    assert(compound("never rejoices") < 0)
  }

  test("round-6 lexicon batch 27 (78 entries, inflections s-z): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("terrorizes") == -2.9 && Lexicon("triumphantly") == 2.6)
    assert(Lexicon("slaughters") == -2.9 && Lexicon("succeeds") == 2.1)
    assert(Lexicon("traumatizes") == -2.7 && Lexicon("uplifts") == 2.0)
    assert(Lexicon("worsens") == -2.0 && Lexicon("treasures") == 2.1)
    assert(label(compound("the choir uplifts the room and succeeds triumphantly")) == "positive")
    assert(label(compound("the gang terrorizes vendors and traumatizes children")) == "negative")
    assert(label(compound("she treasures the serene mornings that soothe her")) == "positive")
    assert(label(compound("the drought worsens and starves the herds")) == "negative")
    // punctuation amplification applies to the new carriers
    assert(compound("this succeeds!!") > compound("this succeeds"))
  }

  test("round-6 lexicon batch 28 (71 entries, internet register 2): curated coverage goldens") {
    // Second social-media batch: the platform-native vocabulary a Reddit
    // corpus actually contains (Hutto & Gilbert 2014 built the lexicon on
    // exactly this register).
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("doxxed") == -2.5 && Lexicon("poggers") == 2.1)
    assert(Lexicon("dumpsterfire") == -2.6 && Lexicon("clutch") == 1.8)
    assert(Lexicon("scammed") == -2.5 && Lexicon("upvoted") == 1.7)
    assert(Lexicon("ghosted") == -1.9 && Lexicon("lmao") == 1.9)
    assert(label(compound("that clutch play was legendary, absolutely poggers")) == "positive")
    assert(label(compound("got scammed then doxxed, a total dumpsterfire")) == "negative")
    assert(label(compound("lmao the wholesome thread got upvoted, love the vibes")) == "positive")
    assert(label(compound("the mods ghosted us and the flamewar turned toxic")) == "negative")
    // negation + slang
    assert(compound("not poggers") < 0)
  }

  test("round-6 lexicon batch 29 (60 entries, high-frequency clearly-valenced words): curated coverage goldens") {
    // Common-word gap fill, restricted to words whose valence is stable
    // across contexts — the published lexicon's rater-agreement screen
    // dropped ambiguous everyday words ("new", "big", "hard"), and so does
    // this curation. Ambiguity check: no batch word appears in the frozen
    // test corpus vocabulary, so the golden corpus-hash pins are unchanged
    // by construction.
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("beauty") == 2.6 && Lexicon("disease") == -2.0)
    assert(Lexicon("friends") == 2.1 && Lexicon("banned") == -2.0)
    assert(Lexicon("liberty") == 1.9 && Lexicon("wound") == -1.9)
    assert(Lexicon("mercy") == 1.6 && Lexicon("vague") == -0.7)
    assert(label(compound("my friends believe in liberty and beauty")) == "positive")
    assert(label(compound("the outbreak of disease delayed every treatment")) == "negative")
    assert(label(compound("a unique romance full of magic and wonder")) == "positive")
    assert(label(compound("banned, isolated, and refused any mercy")) == "negative")
    // the ambiguous tail is deliberately ABSENT
    assert(!Lexicon.contains("new") && !Lexicon.contains("big") && !Lexicon.contains("hard"))
  }

  test("round-6 lexicon batch 30 (103 entries, -ness/-ful/-less derivations): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("selflessness") == 2.0 && Lexicon("ruthlessness") == -2.4)
    assert(Lexicon("togetherness") == 1.9 && Lexicon("loneliness") == -2.1)
    assert(Lexicon("thankfulness") == 2.0 && Lexicon("unfairness") == -2.0)
    assert(Lexicon("loyalty") == 2.1 && Lexicon("recklessness") == -1.9)
    assert(label(compound("her selflessness and loyalty define the team's togetherness")) == "positive")
    assert(label(compound("the unfairness bred loneliness and hopelessness")) == "negative")
    assert(label(compound("thankfulness and gentleness fill the gathering")) == "positive")
    assert(label(compound("his recklessness and meanness caused such unpleasantness")) == "negative")
  }

  test("round-6 lexicon batch 31 (78 entries, un-/dis-/mis- prefixed forms): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("misery") == -2.7 && Lexicon("unethical") == -2.1)
    assert(Lexicon("untrustworthy") == -2.2 && Lexicon("disloyal") == -2.1)
    assert(Lexicon("unloved") == -2.1 && Lexicon("dishonesty") == -2.2)
    // morphological antonym keeps a positive counterpart where one exists
    assert(Lexicon("unbelievable") == 0.8 && Lexicon("unfaithful") == -2.2)
    assert(label(compound("their dishonesty and unethical conduct bred unrest")) == "negative")
    assert(label(compound("an untrustworthy, disloyal and uncaring partner")) == "negative")
    assert(label(compound("the show was unbelievable, honestly delightful")) == "positive")
    // negation of a negated-prefix word still flips
    assert(compound("not unreliable") > 0)
  }

  test("round-6 lexicon batch 32 (47 entries, -ous/-ive/-able adjectives): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("affectionate") == 2.2 && Lexicon("barbarous") == -2.6)
    assert(Lexicon("unforgettable") == 2.0 && Lexicon("remorseless") == -2.3)
    assert(Lexicon("beneficial") == 1.9 && Lexicon("predatory") == -2.2)
    assert(Lexicon("irreplaceable") == 1.8 && Lexicon("conniving") == -2.0)
    assert(label(compound("an affectionate, approachable and reputable host")) == "positive")
    assert(label(compound("a conniving, predatory and remorseless operator")) == "negative")
    assert(label(compound("the retreat was unforgettable and deeply beneficial")) == "positive")
    assert(label(compound("barbarous raids left the region in incurable ruin")) == "negative")
  }

  test("round-6 lexicon batch 33 (68 entries, -ion/-ment nouns + -ing participles): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("devastation") == -2.9 && Lexicon("inspiration") == 2.3)
    assert(Lexicon("corruption") == -2.4 && Lexicon("adoration") == 2.5)
    assert(Lexicon("intimidation") == -2.1 && Lexicon("appreciation") == 2.0)
    assert(Lexicon("suffocating") == -2.1 && Lexicon("rejuvenation") == 1.9)
    assert(label(compound("her dedication earned wide admiration and appreciation")) == "positive")
    assert(label(compound("corruption, intimidation and discrimination at every level")) == "negative")
    assert(label(compound("an inspiration whose determination keeps the team blooming")) == "positive")
    assert(label(compound("the devastation left deprivation and malnutrition behind")) == "negative")
  }

  test("round-6 lexicon batch 34 (83 entries, interjections + comparatives/superlatives): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("bravo") == 2.5 && Lexicon("ouch") == -1.6)
    assert(Lexicon("happiest") == 2.9 && Lexicon("cruelest") == -2.9)
    assert(Lexicon("woot") == 2.2 && Lexicon("ugliest") == -2.5)
    assert(Lexicon("smarter") == 2.0 && Lexicon("dumbest") == -2.5)
    // comparative ladder is monotone where both forms exist
    assert(Lexicon("happier") < Lexicon("happiest"))
    assert(Lexicon("nastier") > Lexicon("nastiest"))
    assert(label(compound("bravo, the happiest crowd and the kindest hosts")) == "positive")
    assert(label(compound("ouch, that was the dumbest and nastiest take yet")) == "negative")
    assert(label(compound("woot, it runs smoother and the ui looks lovelier")) == "positive")
    assert(label(compound("alas, the sequel is uglier and far weaker")) == "negative")
  }

  test("round-6 lexicon batch 35 (83 entries, crime/health/finance registers): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("homicide") == -3.1 && Lexicon("cured") == 2.0)
    assert(Lexicon("bankruptcy") == -2.5 && Lexicon("windfall") == 2.1)
    assert(Lexicon("extortion") == -2.4 && Lexicon("recovery") == 1.7)
    assert(Lexicon("cancer") == -3.4 && Lexicon("bullish") == 1.4)
    assert(label(compound("her recovery after the therapy left everyone grateful")) == "positive")
    assert(label(compound("the indictment alleges bribery, extortion and racketeering")) == "negative")
    assert(label(compound("a windfall dividend and a bullish upturn")) == "positive")
    assert(label(compound("layoffs, foreclosure, then bankruptcy")) == "negative")
  }

  test("round-6 lexicon batch 36 (77 entries, sports/nature/relationships/tech registers): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("soulmate") == 2.7 && Lexicon("divorce") == -2.3)
    assert(Lexicon("honeymoon") == 2.2 && Lexicon("tsunami") == -2.6)
    assert(Lexicon("trophy") == 2.0 && Lexicon("ransomware") == -2.5)
    assert(Lexicon("undefeated") == 2.0 && Lexicon("bricked") == -2.2)
    assert(label(compound("an undefeated season capped with the trophy, bravo")) == "positive")
    assert(label(compound("the update bricked my phone and shipped malware")) == "negative")
    assert(label(compound("their honeymoon reunion felt like sunshine and rainbows")) == "positive")
    assert(label(compound("heartbreak and divorce after the infidelity")) == "negative")
    // review register composes with negation and boosters
    assert(compound("not laggy anymore, very responsive") > 0)
  }

  test("round-6 lexicon batch 37 (91 entries, past-tense action verbs): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("murdered") == -3.1 && Lexicon("rescued") == 2.0)
    assert(Lexicon("hijacked") == -2.4 && Lexicon("graduated") == 1.9)
    assert(Lexicon("tormented") == -2.5 && Lexicon("donated") == 1.7)
    assert(Lexicon("sabotaged") == -2.3 && Lexicon("thrived") == 2.0)
    assert(label(compound("she graduated with honors and was hired immediately")) == "positive")
    assert(label(compound("the convoy was ambushed, looted and destroyed")) == "negative")
    assert(label(compound("volunteers donated supplies and rescued the stranded")) == "positive")
    assert(label(compound("the whistleblower was harassed, demoted and fired")) == "negative")
    // passive-voice negation still flips
    assert(compound("never harassed again") > 0)
  }

  test("round-6 lexicon batch 38 (80 entries, food/education/work/emotion registers): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("euphoric") == 2.9 && Lexicon("brokenhearted") == -2.6)
    assert(Lexicon("mouthwatering") == 2.2 && Lexicon("rancid") == -2.2)
    assert(Lexicon("valedictorian") == 2.2 && Lexicon("plagiarism") == -2.4)
    assert(Lexicon("promotion") == 2.0 && Lexicon("underpaid") == -1.9)
    assert(label(compound("a mouthwatering gourmet feast, simply luscious")) == "positive")
    assert(label(compound("the rancid, soggy leftovers were inedible")) == "negative")
    assert(label(compound("the valedictorian won a scholarship and a promotion")) == "positive")
    assert(label(compound("underpaid, overworked and micromanaged into burnout")) == "negative")
  }

  test("round-6 lexicon batch 39 (88 entries, plural nouns): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("massacres") == -3.1 && Lexicon("miracles") == 2.5)
    assert(Lexicon("atrocities") == -2.9 && Lexicon("heroes") == 2.2)
    assert(Lexicon("failures") == -2.3 && Lexicon("blessings") == 2.3)
    assert(Lexicon("scams") == -2.4 && Lexicon("triumphs") == 2.2)
    assert(label(compound("heroes whose triumphs felt like miracles")) == "positive")
    assert(label(compound("wars, atrocities and massacres filled the report")) == "negative")
    assert(label(compound("blessings, friendships and opportunities everywhere")) == "positive")
    assert(label(compound("scams, frauds and failures at every turn")) == "negative")
  }

  test("round-6 lexicon batch 40 (69 entries, epithets/moral/civic registers): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("justice") == 2.0 && Lexicon("injustice") == -2.4)
    assert(Lexicon("equality") == 2.0 && Lexicon("fascism") == -2.7)
    assert(Lexicon("forgiveness") == 2.0 && Lexicon("treason") == -2.3)
    assert(Lexicon("bliss") == 2.7 && Lexicon("vermin") == -2.4)
    assert(label(compound("justice, equality and transparency prevailed")) == "positive")
    assert(label(compound("the despot's kleptocracy thrived on nepotism and censorship")) == "negative")
    assert(label(compound("grace, forgiveness and redemption — pure bliss")) == "positive")
    assert(label(compound("those swindlers are vermin, parasites and crooks")) == "negative")
  }

  test("round-6 lexicon batch 41 (72 entries, British/Commonwealth spellings): curated coverage goldens") {
    // The reference harvests r/australia (reddit_harvester_aus.py) — the
    // corpus register is Commonwealth English, where 'marvellous' and
    // 'honour' are the common forms, not typos.
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("marvellous") == 2.7 && Lexicon("terrorise") == -2.8)
    assert(Lexicon("honour") == 2.0 && Lexicon("whinge") == -1.4)
    assert(Lexicon("splendour") == 2.4 && Lexicon("traumatised") == -2.7)
    assert(Lexicon("favourable") == 1.9 && Lexicon("patronising") == -1.8)
    assert(label(compound("a marvellous evening of humour and splendour")) == "positive")
    assert(label(compound("stop whingeing about the patronising committee")) == "negative")
    assert(label(compound("honoured and favoured by the whole colourful crowd")) == "positive")
    assert(label(compound("residents were terrorised and traumatised")) == "negative")
    // US/UK pairs agree in valence where both exist
    assert(Lexicon("honour") == Lexicon("honor") || math.abs(Lexicon("honour") - Lexicon("honor")) <= 0.3)
  }

  test("round-6 lexicon batch 42 (69 entries, -ic/-al adjectives + agent nouns): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("terrorist") == -3.1 && Lexicon("peacemaker") == 2.1)
    assert(Lexicon("traitor") == -2.6 && Lexicon("savior") == 2.2)
    assert(Lexicon("psychotic") == -2.3 && Lexicon("idyllic") == 2.3)
    assert(Lexicon("pathetic") == -2.3 && Lexicon("trailblazer") == 2.0)
    assert(label(compound("a charismatic trailblazer and genuine peacemaker")) == "positive")
    assert(label(compound("the pathetic saboteur turned out a traitor")) == "negative")
    assert(label(compound("an idyllic, magical and majestic valley")) == "positive")
    assert(label(compound("horrific, apocalyptic scenes after the invader struck")) == "negative")
  }

  test("round-6 lexicon batch 43 (24 entries, base-verb gap close): curated coverage goldens") {
    // The base-verb sweep came back mostly covered (151 of 175 candidates
    // already present) — the gap that remains is narrow, which is itself
    // evidence the register is converging on the published surface.
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("cripple") == -2.1 && Lexicon("venerate") == 1.8)
    assert(Lexicon("befoul") == -1.9 && Lexicon("astound") == 1.8)
    assert(Lexicon("worsen") == -1.9 && Lexicon("unite") == 1.6)
    assert(label(compound("rebuild, restore and strengthen the alliance")) == "positive")
    assert(label(compound("the sanctions cripple trade and worsen the famine")) == "negative")
  }

  test("round-6 lexicon batch 44 (97 entries, -ity/-ance/-ence abstract nouns): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("poverty") == -2.3 && Lexicon("prosperity") == 2.2)
    assert(Lexicon("negligence") == -2.1 && Lexicon("integrity") == 1.9)
    assert(Lexicon("animosity") == -2.2 && Lexicon("benevolence") == 2.3)
    assert(Lexicon("intolerance") == -1.9 && Lexicon("resilience") == 1.9)
    assert(label(compound("honesty, integrity and generosity define her leadership")) == "positive")
    assert(label(compound("negligence and incompetence deepened the poverty")) == "negative")
    assert(label(compound("the team's resilience and solidarity brought prosperity")) == "positive")
    assert(label(compound("animosity, intolerance and vengeance fed the violence")) == "negative")
  }

  test("round-6 lexicon batch 45 (55 entries, -y colloquial adjectives): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("cozy") == 1.9 && Lexicon("trashy") == -1.7)
    assert(Lexicon("sturdy") == 1.3 && Lexicon("sketchy") == -1.4)
    assert(Lexicon("sunny") == 1.9 && Lexicon("grumpy") == -1.6)
    assert(label(compound("a cozy, sunny cabin with a snug reading nook")) == "positive")
    assert(label(compound("a sketchy, dingy motel with leaky, rusty pipes")) == "negative")
    assert(label(compound("the snazzy new build feels speedy and sturdy")) == "positive")
    assert(label(compound("grumpy staff, smelly rooms, shoddy service")) == "negative")
  }

  test("round-6 lexicon batch 46 (55 entries, adverbs inheriting adjective valence): curated coverage goldens") {
    // Manner adverbs carry their adjective's valence (the published
    // lexicon rates happy 2.7 / happily 2.6-2.7); this batch derives the
    // missing -ly forms from bases already in the lexicon, value-locked
    // to the base by construction.
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("happily") == Lexicon("happy"))
    assert(Lexicon("violently") == Lexicon("violent"))
    assert(Lexicon("gleefully") == Lexicon("gleeful"))
    assert(Lexicon("hopelessly") == Lexicon("hopeless"))
    // pre-existing adverbs keep their own curated values (not overwritten)
    assert(Lexicon("lovingly") == 2.4 && Lexicon("loving") == 2.5)
    assert(label(compound("they happily and warmly welcomed every guest")) == "positive")
    assert(label(compound("he rudely and violently shoved the vendor")) == "negative")
    assert(label(compound("she wisely and patiently rebuilt the archive")) == "positive")
    assert(label(compound("the account was wrongly and shamefully frozen")) == "negative")
  }

  test("round-6 lexicon batch 47 (38 entries, -some/-worthy/-ish + misc): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("loathsome") == -2.5 && Lexicon("noteworthy") == 1.5)
    assert(Lexicon("burdensome") == -1.6 && Lexicon("stylish") == 1.7)
    assert(Lexicon("shambles") == -1.9 && Lexicon("mirth") == 2.0)
    assert(label(compound("a noteworthy, stylish and trustworthy shop")) == "positive")
    assert(label(compound("the rollout was a loathsome, worrisome shambles")) == "negative")
    assert(label(compound("resplendent decor full of verve and pizzazz")) == "positive")
    assert(label(compound("hellish traffic and a burdensome, tiresome commute")) == "negative")
  }

  test("round-6 lexicon batch 48 (88 entries, past participles locked to their base verbs): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    // participle inherits the base verb's pinned value
    assert(Lexicon("captivated") == 2.0 && Lexicon("captivate") == 2.0)
    assert(Lexicon("berated") == -2.0 && Lexicon("berate") == -2.0)
    assert(Lexicon("congratulated") == 2.2 && Lexicon("brutalized") == -2.9)
    // newly added base verbs locked to cognate nouns already in the lexicon
    assert(Lexicon("blaspheme") == -1.9 && Lexicon("blasphemy") == -1.9)
    assert(Lexicon("burglarize") == -2.2 && Lexicon("burglary") == -2.2)
    assert(Lexicon("abomination") == -2.8 && Lexicon("abominable") == -2.8)
    // "coveted" (prized) is deliberately NOT locked to "covet" (the sin)
    assert(Lexicon("coveted") == 0.8 && Lexicon("covet") == -0.9)
    assert(label(compound("the audience was captivated and congratulated the beaming cast")) == "positive")
    assert(label(compound("the botched rollout left users blindsided and aggrieved")) == "negative")
    assert(label(compound("a coveted award for an astounding, beatific performance")) == "positive")
    assert(label(compound("they were conned, blackmailed and brutalized")) == "negative")
  }

  test("round-6 lexicon batch 49 (59 entries, d-f participles locked to their base verbs): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("dazzled") == 2.1 && Lexicon("dazzle") == 2.1)
    assert(Lexicon("despised") == -2.6 && Lexicon("despise") == -2.6)
    assert(Lexicon("enthralled") == 1.9 && Lexicon("defrauded") == -2.3)
    // locked to cognates: "envied" to "envy", "entertained" to "entertaining"
    assert(Lexicon("envied") == -1.3 && Lexicon("envy") == -1.3)
    assert(Lexicon("entertained") == 1.9 && Lexicon("entertaining") == 1.9)
    assert(label(compound("the crowd was dazzled, enthralled and thoroughly entertained")) == "positive")
    assert(label(compound("investors were defrauded, fleeced and fooled")) == "negative")
    assert(label(compound("an enriched, emancipated and fascinated readership")) == "positive")
    assert(label(compound("their hopes were dashed and their work forgotten")) == "negative")
  }

  test("round-6 lexicon batch 50 (53 entries, g-j participles + base verbs): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("galvanized") == 1.3 && Lexicon("galvanize") == 1.3)
    assert(Lexicon("infuriated") == -2.4 && Lexicon("infuriate") == -2.4)
    assert(Lexicon("incarcerated") == -2.2 && Lexicon("incarcerate") == -2.2)
    assert(Lexicon("gladdened") == 1.8 && Lexicon("haunted") == -1.9)
    assert(label(compound("the team felt galvanized, intrigued and included")) == "positive")
    assert(label(compound("witnesses were intimidated, hounded and interrogated")) == "negative")
    assert(label(compound("a gladdened crowd hustled to the glamorized opening")) == "positive")
    assert(label(compound("the budget was gutted and the staff left incensed")) == "negative")
  }

  test("round-6 lexicon batch 51 (47 entries, k-o participles + base verbs): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("loathed") == -2.5 && Lexicon("loathe") == -2.5)
    assert(Lexicon("nourished") == 1.6 && Lexicon("nourish") == 1.6)
    assert(Lexicon("massacred") == -3.1 && Lexicon("mastered") == 1.7)
    // "outsmarted" (you got beaten) deliberately flips "outsmart" (you won)
    assert(Lexicon("outsmart") == 0.9 && Lexicon("outsmarted") == -0.9)
    assert(label(compound("she mastered the craft and was lionized for it")) == "positive")
    assert(label(compound("tenants were overcharged, misled and marginalized")) == "negative")
    assert(label(compound("a mended, nourished and motivated community")) == "positive")
    assert(label(compound("critics lambasted the mortifying, muddled rollout")) == "negative")
  }

  test("round-6 lexicon batch 52 (40 entries, p-s participles + base verbs): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("perfected") == 2.7 && Lexicon("perfect") == 2.7)
    assert(Lexicon("persecuted") == -2.4 && Lexicon("persecute") == -2.4)
    assert(Lexicon("revered") == 2.0 && Lexicon("ridiculed") == -2.1)
    assert(Lexicon("rehabilitated") == 1.6 && Lexicon("rehabilitate") == 1.6)
    assert(label(compound("a revered mentor who perfected and purified the process")) == "positive")
    assert(label(compound("the village was plundered, ravaged and scorched")) == "negative")
    assert(label(compound("customers were reimbursed and felt refreshed and rejuvenated")) == "positive")
    assert(label(compound("he was ridiculed, rebuked and scorned in public")) == "negative")
  }

  test("round-6 lexicon batch 53 (69 entries, s-w participles + base verbs): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("slaughtered") == -3.0 && Lexicon("slaughter") == -3.0)
    assert(Lexicon("strengthened") == 1.6 && Lexicon("strengthen") == 1.6)
    assert(Lexicon("terrorized") == -2.9 && Lexicon("soothed") == 1.7)
    // "shamed" locks to "shame" (-2.1), not the unrelated noun "sham"
    assert(Lexicon("shamed") == -2.1 && Lexicon("violated") == -2.1)
    assert(label(compound("the team felt strengthened, unified and validated")) == "positive")
    assert(label(compound("witnesses were terrorized, stalked and threatened")) == "negative")
    assert(label(compound("a sheltered, soothed and treasured community")) == "positive")
    assert(label(compound("their savings were squandered and their name sullied")) == "negative")
  }

  test("round-6 lexicon batch 54 (365 entries, -ing gerunds value-locked to their verb bases): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("betraying") == -2.8 && Lexicon("betray") == -2.8)
    assert(Lexicon("praising") == 2.4 && Lexicon("praise") == 2.4)
    assert(Lexicon("torturing") == -3.1 && Lexicon("rescuing") == 1.9)
    // ambiguous derivations resolve to the verb: scare (not scar), shame (not sham)
    assert(Lexicon("scaring") == -2.2 && Lexicon("shaming") == -2.1)
    // garbage derivations were excluded, not generated blindly
    assert(!Lexicon.contains("diing") && !Lexicon.contains("talenting"))
    // "dashing" (the positive adjective) must not inherit dash's negative
    // value — the round-7 batch added it as a curated POSITIVE entry
    assert(Lexicon("dashing") == 1.5)
    assert(label(compound("mentoring, uplifting and strengthening the whole team")) == "positive")
    assert(label(compound("they kept harassing, taunting and ridiculing him")) == "negative")
    assert(label(compound("a relaxing, invigorating and rejuvenating retreat")) == "positive")
    assert(label(compound("stop sabotaging, undermining and demoralizing the crew")) == "negative")
  }

  test("round-6 lexicon batch 55 (297 entries, third-person -s forms locked to verb bases): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("inspires") == 2.3 && Lexicon("inspire") == 2.3)
    assert(Lexicon("murders") == -3.2 && Lexicon("murder") == -3.2)
    assert(Lexicon("nurtures") == 1.6 && Lexicon("terrorises") == -2.8)
    // ambiguous plurals were excluded ("contents", "fines", "dashes")
    assert(!Lexicon.contains("contents") && !Lexicon.contains("fines"))
    assert(label(compound("she inspires, mentors and empowers her students")) == "positive")
    assert(label(compound("he taunts, belittles and torments his rivals")) == "negative")
    assert(label(compound("the spa relaxes, rejuvenates and revitalizes guests")) == "positive")
    assert(label(compound("the scheme defrauds, swindles and shortchanges investors")) == "negative")
  }

  test("round-6 lexicon batch 56 (36 entries, irregular pasts + doubled-consonant forms): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("won") == 2.8 && Lexicon("win") == 2.8)
    assert(Lexicon("stole") == -2.2 && Lexicon("stolen") == -2.2)
    assert(Lexicon("stabbing") == -2.5 && Lexicon("scamming") == -2.2)
    assert(Lexicon("forbade") == -1.5 && Lexicon("forbidden") == -1.5)
    assert(label(compound("she won the case and was reassured and calmed")) == "positive")
    assert(label(compound("thieves stole the payroll and fled")) == "negative")
    assert(label(compound("the garden sparkled while the town throve")) == "positive")
    assert(label(compound("he wept, mourned and struggled alone")) == "negative")
  }

  test("round-6 lexicon batch 57 (61 entries, agent nouns hand-curated from verb bases): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("abuser") == -3.2 && Lexicon("abuse") == -3.2)
    assert(Lexicon("inspirer") == 2.3 && Lexicon("torturer") == -3.1)
    // -ate verbs take -ator, never the mechanical -er ("manipulater")
    assert(Lexicon("manipulator") == -1.5 && !Lexicon.contains("manipulater"))
    assert(Lexicon("motivator") == 1.7 && !Lexicon.contains("treasurer"))
    assert(label(compound("a great motivator, encourager and nurturer of talent")) == "positive")
    assert(label(compound("every harasser and blackmailer was banned from the forum")) == "negative")
    assert(label(compound("an entertainer and charmer adored by the crowd")) == "positive")
    assert(label(compound("the manipulator turned out to be a fraudster and a thief")) == "negative")
  }

  test("round-6 lexicon batch 58 (48 entries, internet register 3: platform-abuse vocabulary): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("gaslighting") == -2.2 && Lexicon("doxxing") == -2.4)
    assert(Lexicon("banger") == 1.8 && Lexicon("bff") == 2.4)
    assert(Lexicon("brigading") == -1.8 && Lexicon("wack") == -1.7)
    assert(label(compound("my bff dropped an absolute banger, so pumped")) == "positive")
    assert(label(compound("they kept gaslighting, doxxing and brigading users")) == "negative")
    assert(label(compound("luv this based and cracked team")) == "positive")
    assert(label(compound("the launch was mid and the forum got spammed by griefers")) == "negative")
  }

  test("round-6 lexicon batch 59 (28 entries, -ment/-tion abstract nouns + vitality register): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("disappointment") == -2.2 && Lexicon("satisfaction") == 1.9)
    assert(Lexicon("enlightenment") == 1.9 && Lexicon("imprisonment") == -2.1)
    assert(Lexicon("accomplishment") == 1.8 && Lexicon("boredom") == -1.3)
    assert(label(compound("a sense of satisfaction and accomplishment in her work")) == "positive")
    assert(label(compound("years of disappointment, boredom and disillusionment")) == "negative")
    assert(label(compound("the retreat restored his vigor, wellness and vitality")) == "positive")
    assert(label(compound("the verdict meant banishment and imprisonment")) == "negative")
  }

  test("round-6 lexicon batch 60 (91 entries, everyday low-intensity adjectives): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("foul") == -2.2 && Lexicon("trusty") == 1.7)
    assert(Lexicon("peachy") == 1.9 && Lexicon("vapid") == -1.5)
    // deliberately low-magnitude: everyday words carry mild valence
    assert(math.abs(Lexicon("mild")) < 1.0 && math.abs(Lexicon("subtle")) < 1.0)
    assert(label(compound("a trusty, spotless and thorough mechanic")) == "positive")
    assert(label(compound("the room was moldy, icky and unkempt")) == "negative")
    assert(label(compound("everything is just peachy and dandy here")) == "positive")
    assert(label(compound("a trite, vapid and humdrum sequel")) == "negative")
  }

  test("round-6 lexicon batch 61 (313 entries, derivational-noun plurals locked to their singulars): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("jubilations") == Lexicon("jubilation"))
    assert(Lexicon("accomplishments") == Lexicon("accomplishment"))
    assert(Lexicon("temptations") == Lexicon("temptation"))
    assert(Lexicon("victimizations") == Lexicon("victimization"))
    // awkward or sense-shifting plurals were excluded, not mass-generated
    assert(!Lexicon.contains("patiences") && !Lexicon.contains("securities"))
    assert(!Lexicon.contains("humanities") && !Lexicon.contains("vehements"))
    assert(label(compound("great accomplishments and inspirations all around")) == "positive")
    assert(label(compound("endless frustrations, humiliations and betrayals")) == "negative")
    assert(label(compound("the celebrations brought jubilations and felicities")) == "positive")
    assert(label(compound("wars bring atrocities, deprivations and desolations")) == "negative")
  }

  test("round-6 lexicon batch 62 (480 entries, suffix-derived -ly adverbs locked to adjective bases): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("flawlessly") == Lexicon("flawless"))
    assert(Lexicon("heinously") == Lexicon("heinous"))
    assert(Lexicon("admirably") == Lexicon("admirable"))
    assert(Lexicon("deceitfully") == Lexicon("deceitful"))
    // non-words and wrong derivations stayed out
    assert(!Lexicon.contains("unably") && !Lexicon.contains("sycophantly"))
    assert(!Lexicon.contains("abandonmently") && !Lexicon.contains("strively"))
    // booster-role adverbs stay OUT of the lexicon (modifier role wins):
    // an entry would silently kill "incredibly uplifting"-style boosts
    assert(!Lexicon.contains("incredibly") && !Lexicon.contains("remarkably"))
    assert(!Lexicon.contains("fabulously") && !Lexicon.contains("tremendously"))
    assert(label(compound("the team executed flawlessly and collaborated wonderfully")) == "positive")
    assert(label(compound("they acted heinously, deceitfully and shamelessly")) == "negative")
    assert(label(compound("a remarkably and admirably generous offer")) == "positive")
    assert(label(compound("the funds were ruinously and unlawfully diverted")) == "negative")
  }

  test("round-6 lexicon batch 63 (47 entries, -ier/-iest/-iness forms of -y adjectives): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("filthiest") == Lexicon("filthy"))
    assert(Lexicon("liveliest") == Lexicon("lively"))
    assert(Lexicon("sleazier") == Lexicon("sleazy"))
    assert(Lexicon("clumsiness") == Lexicon("clumsy"))
    assert(label(compound("the liveliest and heartiest crowd of the tour")) == "positive")
    assert(label(compound("the filthiest, sleaziest scam yet")) == "negative")
    assert(label(compound("tidier code and a livelier team")) == "positive")
    assert(label(compound("he grew unhappier, lonelier and wearier")) == "negative")
  }

  test("round-6 lexicon batch 64 (64 entries, medical/disaster/legal registers): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("kidnapping") == -2.8 && Lexicon("hostage") == -2.5)
    assert(Lexicon("pneumonia") == -2.0 && Lexicon("ceasefire") == 1.3)
    assert(Lexicon("peacekeeping") == 1.5 && Lexicon("eviction") == -2.1)
    assert(label(compound("the ceasefire held and the truce became a treaty")) == "positive")
    assert(label(compound("an outbreak of cholera, malaria and typhoid")) == "negative")
    assert(label(compound("she won the lottery and inherited a cherished heirloom")) == "positive")
    assert(label(compound("the standoff ended in a shootout and a manhunt")) == "negative")
  }

  test("round-6 lexicon batch 65 (46 entries, role nouns and praise/insult registers): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("saint") == 2.1 && Lexicon("fiend") == -2.0)
    assert(Lexicon("travesty") == -2.2 && Lexicon("paragon") == 1.9)
    assert(Lexicon("deadbeat") == -1.9 && Lexicon("luminary") == 1.8)
    // literal-use animal words were deliberately excluded
    assert(!Lexicon.contains("wolf") && !Lexicon.contains("pig"))
    assert(label(compound("a gem of a mentor, a true maestro and luminary")) == "positive")
    assert(label(compound("the deal was a travesty run by grifters and racketeers")) == "negative")
    assert(label(compound("she is a wizard with data and a paragon of patience")) == "positive")
    assert(label(compound("a ramshackle, fetid flat run by a deadbeat landlord")) == "negative")
  }

  test("round-6 lexicon batch 66 (94 entries, agent-noun plurals locked to their singulars): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("harassers") == Lexicon("harasser"))
    assert(Lexicon("inspirers") == Lexicon("inspirer"))
    assert(Lexicon("terrorists") == Lexicon("terrorist"))
    assert(Lexicon("racketeers") == Lexicon("racketeer"))
    // comparatives never masquerade as agent plurals
    assert(!Lexicon.contains("happiers") && !Lexicon.contains("angriers"))
    assert(label(compound("a community of healers, encouragers and motivators")) == "positive")
    assert(label(compound("the ring of swindlers, extorters and blackmailers")) == "negative")
    assert(label(compound("supporters and defenders rallied to the rescuers")) == "positive")
    assert(label(compound("stalkers and harassers plagued the forum")) == "negative")
  }

  test("round-6 lexicon batch 67 (63 entries, emotion-expression verbs): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("giggle") == 1.7 && Lexicon("giggling") == 1.7)
    assert(Lexicon("sneer") == -1.7 && Lexicon("sneering") == -1.7)
    assert(Lexicon("exult") == 2.2 && Lexicon("jubilate") == 2.6)
    assert(Lexicon("frolic") == 1.7 && Lexicon("grovel") == -1.5)
    assert(label(compound("the kids giggled and frolicked in the garden")) == "positive")
    assert(label(compound("he scowled, sneered and fumed through the meeting")) == "negative")
    assert(label(compound("fans exulted and reveled in the victory")) == "positive")
    assert(label(compound("she trembled and shuddered at the snarling dog")) == "negative")
  }

  test("round-6 lexicon batch 68 (114 entries, inflections of the emotion verbs): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("frolicked") == Lexicon("frolic"))
    assert(Lexicon("shuddered") == Lexicon("shudder"))
    assert(Lexicon("snarling") == Lexicon("snarl"))
    // consonant-doubling and c→ck handled, not mechanical suffixing
    assert(Lexicon("snubbing") == Lexicon("snub") && !Lexicon.contains("frolicing"))
    assert(label(compound("they frolicked, giggled and swooned all afternoon")) == "positive")
    assert(label(compound("he groveled, moaned and sniveled for forgiveness")) == "negative")
    assert(label(compound("the critics gushed and exulted over the premiere")) == "positive")
    assert(label(compound("commuters scowled, fretted and grumbled in the delay")) == "negative")
  }

  test("round-6 lexicon batch 69 (30 entries, food/weather/commerce registers): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("delish") == 2.2 && Lexicon("curdled") == -1.5)
    assert(Lexicon("unspoiled") == 1.6 && Lexicon("sweltering") == -1.4)
    assert(Lexicon("freebie") == 1.5 && Lexicon("scalping") == -1.8)
    assert(label(compound("a delish, buttery and crunchy pastry")) == "positive")
    assert(label(compound("a muggy, sweltering and torrential afternoon")) == "negative")
    assert(label(compound("an unspoiled coastline with glistening water")) == "positive")
    assert(label(compound("the curdled milk smelled dank and the kitchen was untidy")) == "negative")
  }

  test("round-6 lexicon batch 70 (22 entries, superlative-able adjectives and negated forms): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("unbeatable") == 2.2 && Lexicon("unbeatably") == 2.2)
    assert(Lexicon("unlovable") == -2.0 && Lexicon("uncharitable") == -1.5)
    assert(Lexicon("indomitable") == 1.9 && Lexicon("injudicious") == -1.4)
    assert(label(compound("an unbeatable deal from an unflappable team")) == "positive")
    assert(label(compound("a disorderly, uncharitable and injudicious response")) == "negative")
    assert(label(compound("her indomitable spirit proved incomparable")) == "positive")
    assert(label(compound("the untrusted vendor shipped unlovable hardware")) == "negative")
  }

  test("round-6 lexicon batch 71 (129 entries, topical registers: travel, arts, health, finance, competition): curated coverage goldens") {
    import graft.functions.VaderSentiment.Lexicon
    assert(Lexicon("getaway") == 1.6 && Lexicon("gridlock") == -1.8)
    assert(Lexicon("cacophony") == -1.9 && Lexicon("masterwork") == 2.4)
    assert(Lexicon("malnourished") == -2.2 && Lexicon("hydrated") == 1.0)
    assert(Lexicon("embezzled") == -2.7 && Lexicon("windfalls") == 1.8)
    assert(Lexicon("trainwreck") == -2.5 && Lexicon("godsend") == 2.6)
    assert(Lexicon("clunky") == -1.6 && Lexicon("futureproof") == 1.4)
    assert(label(compound("a panoramic getaway full of sightseeing and souvenirs")) == "positive")
    assert(label(compound("jetlag, gridlock and a sprained ankle ruined the layover")) == "negative")
    assert(label(compound("a soulful encore from the symphonic masterwork")) == "positive")
    assert(label(compound("a clunky, bloated app whose uptime cratered")) == "negative")
    assert(label(compound("the windfalls left them wellpaid and stabilized")) == "positive")
    assert(label(compound("the conman defaulted after laundering the kickback")) == "negative")
    assert(label(compound("they clinched the tiebreaker with a buzzerbeater")) == "positive")
    assert(label(compound("the trainwreck meeting stagnated into a minefield")) == "negative")
  }

  test("round-7 batch (108 entries): published-parity gap fill, count ≥ 7500") {
    import graft.functions.VaderSentiment.Lexicon
    // published-parity milestone: entry count at or above the ~7.5k
    // published lexicon; growth by hand-batches stops here.
    assert(Lexicon.size >= 7500, s"expected ≥7500 entries, got ${Lexicon.size}")
    assert(Lexicon("abhorrent") == -3.1 && Lexicon("agonise") == -2.4)
    assert(Lexicon("ability") == 1.3 && Lexicon("brighten") == 1.9)
    assert(Lexicon("admit") == -0.1 && Lexicon("backed") == 0.1)
    assert(Lexicon("sadistically") == -2.9 && Lexicon("terrifically") == 2.6)
    // inflections stay consistent with their bundled relatives
    assert(math.abs(Lexicon("agonise") - Lexicon("agonize")) <= 0.3)
    assert(math.abs(Lexicon("acquitted") - Lexicon("acquit")) <= 0.5)
    assert(label(compound("fortunately the outcome was terrifically satisfying")) == "positive")
    assert(label(compound("an abhorrent and sadistically cruel act")) == "negative")
    assert(label(compound("her abilities made the rollout refreshingly smooth")) == "positive")
    assert(label(compound("the whining deniers kept agitating unfairly")) == "negative")
  }

  test("lexicon entries never shadow booster words (modifier role wins)") {
    // The scorer only applies a booster when the modifier is NOT itself a
    // lexicon entry; a colliding entry would silently kill the boost. Keep
    // the sets disjoint. (Negators may overlap by design — "no"/"nope"
    // carry their own valence AND flip following carriers.)
    import graft.functions.VaderSentiment.{Boosters, Lexicon}
    val collisions = Lexicon.keySet.intersect(Boosters.keySet)
    assert(collisions.isEmpty, s"booster/lexicon collisions: $collisions")
    // and the boost actually fires for a couple of them
    assert(compound("remarkably good") > compound("good"))
    assert(compound("amazingly kind") > compound("kind"))
  }
}
