package graft

import org.apache.spark.sql.functions._
import graft.functions.TextMatch

/** Spark-vs-hand-computed cases for the negation-aware matcher
  * (reference semantics: process_capex.py:82-145, re-specified token-based
  * per SURVEY.md §4).
  */
class TextMatchSpec extends SparkSpecBase {
  import spark.implicits._

  private def flags(texts: String*): Map[String, Map[String, Boolean]] = {
    val df = texts.toSeq.toDF("t")
      .withColumn("toks", TextMatch.tokens(col("t")))
      .withColumn("nn", TextMatch.nonNegatedTokens(col("toks")))
      .select(
        col("t"),
        TextMatch.isTestDemo(col("toks"), col("nn")).as("test_demo"),
        TextMatch.isPersonal(col("toks"), col("nn")).as("personal"),
        TextMatch.mentionsDarkStore(col("toks"), col("nn")).as("dark_store"),
        TextMatch.mentionsCounter(col("toks"), col("nn")).as("counter"),
        TextMatch.mentionsDsWord(col("toks")).as("ds"),
        TextMatch.anyPhraseNonNegated(col("toks"), TextMatch.PersonalDeviceWords).as("device"))
    df.collect().map { r =>
      r.getString(0) -> Map(
        "test_demo" -> r.getBoolean(1), "personal" -> r.getBoolean(2),
        "dark_store" -> r.getBoolean(3), "counter" -> r.getBoolean(4),
        "ds" -> r.getBoolean(5), "device" -> r.getBoolean(6))
    }.toMap
  }

  test("plain phrase matches; negated within 3 tokens does not") {
    val f = flags(
      "test setup for sorting line",
      "not a test deployment",
      "this is definitely really surely a test", // negation window passed
      "no dark store here",
      "for dark store operations",
      "install counter at desk",
      "skip the counter build")
    assert(f("test setup for sorting line")("test_demo"))
    assert(!f("not a test deployment")("test_demo"))
    assert(f("this is definitely really surely a test")("test_demo"))
    assert(!f("no dark store here")("dark_store"))
    assert(f("for dark store operations")("dark_store"))
    assert(f("install counter at desk")("counter"))
    assert(!f("skip the counter build")("counter"))
  }

  test("whole-word semantics: no substring hits") {
    val f = flags(
      "industrial trial equipment", // 'trial' is a token here (second word)
      "industrial equipment",       // 'trial' inside 'industrial' must NOT hit
      "encounter issues",           // 'counter' inside 'encounter' must NOT hit
      "laptops ordered")            // 'laptop' != token 'laptops'
    assert(f("industrial trial equipment")("test_demo"))
    assert(!f("industrial equipment")("test_demo"))
    assert(!f("encounter issues")("counter"))
    assert(!f("laptops ordered")("device"))
  }

  test("multi-token phrases and ds word boundary") {
    val f = flags(
      "new macbook pro for lead",
      "without macbook pro allocation",
      "DS facility expansion",
      "ds-hub rollout",
      "words pending")
    assert(f("new macbook pro for lead")("device"))
    assert(!f("without macbook pro allocation")("device"))
    assert(f("DS facility expansion")("ds"))
    assert(f("ds-hub rollout")("ds")) // hyphen splits tokens
    assert(!f("words pending")("ds"))
  }

  test("negation window is exactly 3 tokens") {
    val f = flags(
      "no x y test",      // neg 3 back -> negated
      "no x y z test")    // neg 4 back -> not negated
    assert(!f("no x y test")("test_demo"))
    assert(f("no x y z test")("test_demo"))
  }

  test("Spark HOF matcher agrees with the plain-Scala reference matcher") {
    import graft.capex.CapexVocab
    val texts = (CapexVocab.Remarks ++ CapexVocab.Items ++ CapexVocab.ItemCats ++
      Seq("no laptop here", "not a macbook pro", "skip trial run", "plain text"))
    val phraseSets = Seq(TextMatch.TestDemoPhrases, TextMatch.PersonalNonBusinessPhrases,
      TextMatch.DarkStorePhrases, TextMatch.CounterPhrases, TextMatch.PersonalDeviceWords)
    val df = texts.toDF("t").withColumn("toks", TextMatch.tokens(col("t")))
    val cols = phraseSets.zipWithIndex.map { case (ps, i) =>
      TextMatch.anyPhraseNonNegated(col("toks"), ps).as(s"f$i")
    }
    val got = df.select(col("t") +: cols: _*).collect()
      .map(r => r.getString(0) -> phraseSets.indices.map(i => r.getBoolean(i + 1))).toMap
    texts.foreach { t =>
      val toks = TextMatch.Ref.tokens(t)
      val want = phraseSets.map(ps => TextMatch.Ref.anyPhraseNonNegated(toks, ps))
      assert(got(t) == want, s"mismatch for '$t': got ${got(t)}, ref $want")
    }
  }

  test("property: Spark matcher == reference matcher on random negation-laced texts") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.rng.Seed
    // random texts over a vocabulary that mixes phrase words, negations,
    // multi-token phrase fragments, and noise — adversarial for window and
    // boundary logic
    val vocab = Seq("test", "demo", "macbook", "pro", "dark", "store", "no",
      "not", "without", "skip", "hub", "ops", "x", "laptop", "counter",
      "personal", "a", "the")
    val genText = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val texts = Gen.listOfN(300, genText)
      .apply(Gen.Parameters.default, Seed(20260812L)).get.distinct
    val phraseSets = Seq(TextMatch.TestDemoPhrases,
      TextMatch.PersonalNonBusinessPhrases, TextMatch.DarkStorePhrases,
      TextMatch.CounterPhrases, TextMatch.PersonalDeviceWords)
    val df = texts.toDF("t").withColumn("toks", TextMatch.tokens(col("t")))
    val cols = phraseSets.zipWithIndex.map { case (ps, i) =>
      TextMatch.anyPhraseNonNegated(col("toks"), ps).as(s"f$i")
    }
    val got = df.select(col("t") +: cols: _*).collect()
      .map(r => r.getString(0) -> phraseSets.indices.map(i => r.getBoolean(i + 1))).toMap
    texts.foreach { t =>
      val toks = TextMatch.Ref.tokens(t)
      val want = phraseSets.map(ps => TextMatch.Ref.anyPhraseNonNegated(toks, ps))
      assert(got(t) == want, s"mismatch for '$t': got ${got(t)}, ref $want")
    }
  }

  test("equipment regexes") {
    val rows = Seq(
      "Fire Extinguisher ABC",   // fire
      "Ceiling Fan 48in",        // fan
      "fans for hub",            // fan plural
      "Split AC 2 Ton",          // ac with context
      "AC",                      // ac w/o context -> no
      "Air Conditioner unit",    // aircond
      "CCTV - BRANCH",           // cctv
      "dome camera kit",         // camera
      "STOOL - Ops",             // stool-ops
      "Conveyor Belt")           // none
      .toDF("t")
      .select(col("t"), TextMatch.isExcludedEquipment(col("t")).as("x"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows("Fire Extinguisher ABC")); assert(rows("Ceiling Fan 48in"))
    assert(rows("fans for hub")); assert(rows("Split AC 2 Ton"))
    assert(!rows("AC")); assert(rows("Air Conditioner unit"))
    assert(rows("CCTV - BRANCH")); assert(rows("dome camera kit"))
    assert(rows("STOOL - Ops")); assert(!rows("Conveyor Belt"))
  }
}
