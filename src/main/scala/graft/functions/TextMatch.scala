package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Negation-aware keyword/phrase analysis re-expressed for Spark.
  *
  * Reference semantics (process_capex.py:82-145): a phrase "matches" a text
  * if it occurs with word boundaries and is not preceded within a 3-token
  * window by a negation word ("no laptop", "not a dark store" do not match).
  *
  * We specify it token-based (SURVEY.md §4): tokens are `[a-z0-9']+` runs of
  * the lowercased text; a phrase occurrence is a consecutive token
  * subsequence; it is negated iff any of the 3 tokens preceding its first
  * token is a negation word. The matcher is a pure Column expression
  * (higher-order functions — no UDF, stays inside codegen'd stages and
  * distributes trivially at 100 TB), and `Sql.*` emits the DuckDB-equivalent
  * expression so oracles verify the same semantics.
  */
object TextMatch {

  /** process_capex.py:63-65 */
  val NegationWords: Seq[String] = Seq(
    "no", "not", "without", "exclude", "excluding", "except",
    "avoid", "cancel", "cancelled", "drop", "skip")

  // Phrase vocabularies (process_capex.py:66-80)
  val TestDemoPhrases: Seq[String] =
    Seq("test", "demo", "sample", "trial", "pilot", "experimental")
  val PersonalNonBusinessPhrases: Seq[String] =
    Seq("personal", "individual", "non-business", "non operational", "non-operational")
  val ExperimentalPhrases: Seq[String] = Seq("experimental")
  val DarkStorePhrases: Seq[String] =
    Seq("dark store", "dark-store", "darkstores", "darkstore")
  val CounterPhrases: Seq[String] = Seq("counter")
  val PersonalDeviceWords: Seq[String] = Seq(
    "laptop", "macbook", "notebook", "macbook pro", "macbook air", "chromebook",
    "tablet", "ipad", "surface pro", "iphone", "mobile phone", "smartphone",
    "dell", "hp", "lenovo", "asus")

  private def phraseTokens(phrase: String): Seq[String] =
    phrase.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).toSeq

  /** Tokenize a text column: lowercase, runs of [a-z0-9']. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(coalesce(text, lit(""))), lit("[a-z0-9']+"), lit(0))

  /** Tokens whose position is NOT negation-guarded (no negation word within
    * the 3 preceding tokens). Computed ONCE per row, this turns every
    * single-token phrase check into a cheap membership test — the positional
    * scan only remains for multi-token phrases.
    */
  def nonNegatedTokens(toks: Column): Column = {
    val negarr = array(NegationWords.map(lit): _*)
    filter(toks, (_, i) => {
      val pos = i + lit(1)
      val wstart = greatest(pos - lit(3), lit(1))
      !arrays_overlap(slice(toks, wstart, pos - wstart), negarr)
    })
  }

  /** True iff `phrase` occurs in the token array non-negated. `toks` should
    * be a pre-computed `tokens(...)` column and `nnToks` a pre-computed
    * `nonNegatedTokens(toks)` so one pass feeds all phrase checks.
    */
  def phraseNonNegated(toks: Column, nnToks: Column, phrase: String): Column = {
    val p = phraseTokens(phrase)
    val k = p.length
    require(k > 0, s"empty phrase: '$phrase'")
    if (k == 1) {
      array_contains(nnToks, p.head)
    } else {
      val parr = array(p.map(lit): _*)
      val negarr = array(NegationWords.map(lit): _*)
      val hits = filter(toks, (_, i) => {
        val pos = i + lit(1) // 1-based position of candidate occurrence start
        val isOcc = (i + lit(k) <= size(toks)) && (slice(toks, pos, lit(k)) === parr)
        val wstart = greatest(pos - lit(3), lit(1))
        val negated = arrays_overlap(slice(toks, wstart, pos - wstart), negarr)
        isOcc && !negated
      })
      size(hits) > 0
    }
  }

  /** Any of `phrases` non-negated (reference `_any_phrase_with_negation_awareness`). */
  def anyPhraseNonNegated(toks: Column, nnToks: Column, phrases: Seq[String]): Column =
    phrases.map(phraseNonNegated(toks, nnToks, _)).reduce(_ || _)

  /** Convenience overload computing the non-negated pass inline (specs). */
  def anyPhraseNonNegated(toks: Column, phrases: Seq[String]): Column =
    anyPhraseNonNegated(toks, nonNegatedTokens(toks), phrases)

  /** Plain whole-word containment, no negation check (reference `\bds\b` etc). */
  def hasToken(toks: Column, word: String): Column =
    array_contains(toks, word.toLowerCase)

  /** Reference `remark_flags` (process_capex.py:130-145) as named flag
    * columns. All take the pre-computed (toks, nonNegatedTokens) pair. */
  def isTestDemo(toks: Column, nn: Column): Column = anyPhraseNonNegated(toks, nn, TestDemoPhrases)
  def isPersonal(toks: Column, nn: Column): Column = anyPhraseNonNegated(toks, nn, PersonalNonBusinessPhrases)
  def isExperimental(toks: Column, nn: Column): Column = anyPhraseNonNegated(toks, nn, ExperimentalPhrases)
  def mentionsDarkStore(toks: Column, nn: Column): Column = anyPhraseNonNegated(toks, nn, DarkStorePhrases)
  def mentionsCounter(toks: Column, nn: Column): Column = anyPhraseNonNegated(toks, nn, CounterPhrases)
  def mentionsDsWord(toks: Column): Column = hasToken(toks, "ds")

  /** Equipment-exclusion regexes (process_capex.py:353-373). Identical
    * pattern strings evaluate the same under Java regex (Spark rlike) and
    * RE2 (DuckDB regexp_matches): only `\b \s \w (?:) (?i)` are used.
    */
  object Regexes {
    val Fire    = "(?i)fire\\s*extinguish\\w*|\\bfire\\s*ex\\w*|\\bfireex\\b"
    val Fan     = "(?i)\\bfans?\\b"
    val AirCond = "(?i)air\\s*condit\\w*|air[-\\s]*conditioning|air\\s*con\\b|aircon\\b|a\\s*/\\s*c"
    val AcWord  = "(?i)\\bac\\b"
    val AcContext = "(?i)split|window|\\bton\\b|inverter|compressor|air|cond"
    val Cctv    = "(?i)\\bcctv\\b|camera"
    val StoolOps = "(?i)stool\\s*-\\s*ops"
  }

  /** Rule 3a predicate over the combined item/category text. */
  def isExcludedEquipment(combined: Column): Column = {
    import Regexes._
    val c = coalesce(combined, lit(""))
    c.rlike(Fire) || c.rlike(Fan) || c.rlike(AirCond) ||
      (c.rlike(AcWord) && c.rlike(AcContext)) ||
      c.rlike(Cctv) || c.rlike(StoolOps)
  }

  /** Plain-Scala reference implementation of the same token semantics —
    * used to constant-fold flags over closed vocabularies at SQL-generation
    * time (CapexSqlGen) and to cross-check the Spark HOF matcher in specs.
    */
  object Ref {
    private val TokenRe = "[a-z0-9']+".r
    def tokens(s: String): Vector[String] = TokenRe.findAllIn(s.toLowerCase).toVector

    def phraseNonNegated(toks: Vector[String], phrase: String): Boolean = {
      val p = phraseTokens(phrase)
      val k = p.length
      (0 to toks.length - k).exists { i =>
        toks.slice(i, i + k) == p &&
          !toks.slice(math.max(i - 3, 0), i).exists(NegationWords.contains)
      }
    }

    def anyPhraseNonNegated(toks: Vector[String], phrases: Seq[String]): Boolean =
      phrases.exists(phraseNonNegated(toks, _))

    def hasToken(toks: Vector[String], word: String): Boolean =
      toks.contains(word.toLowerCase)
  }

  // ---------------------------------------------------------------------
  // DuckDB SQL emitters — same semantics, for the driver's oracle.
  // ---------------------------------------------------------------------
  object Sql {
    private def q(s: String): String = "'" + s.replace("'", "''") + "'"
    private def strList(ws: Seq[String]): String = ws.map(q).mkString("[", ", ", "]")

    /** Token-array expression over a text expression. */
    def tokens(textExpr: String): String =
      s"regexp_extract_all(lower(coalesce($textExpr, '')), '[a-z0-9'']+')"

    /** Tokens at non-negated positions — mirror of nonNegatedTokens. */
    def nonNegatedTokens(toksExpr: String): String = {
      val negarr = strList(NegationWords)
      s"list_filter($toksExpr, (t, i) -> NOT " +
        s"list_has_any(($toksExpr)[greatest(i-3,1):i-1], $negarr))"
    }

    /** Non-negated phrase match over pre-computed (toks, nnToks) exprs. */
    def phraseNonNegated(toksExpr: String, nnExpr: String, phrase: String): String = {
      val p = phraseTokens(phrase)
      val k = p.length
      if (k == 1) {
        s"list_contains($nnExpr, ${q(p.head)})"
      } else {
        val parr = strList(p)
        val negarr = strList(NegationWords)
        s"len(list_filter(range(1, greatest(len($toksExpr) - ${k - 1}, 0) + 1), " +
          s"i -> ($toksExpr)[i:i+${k - 1}] = $parr AND NOT " +
          s"list_has_any(($toksExpr)[greatest(i-3,1):i-1], $negarr))) > 0"
      }
    }

    def anyPhraseNonNegated(toksExpr: String, nnExpr: String, phrases: Seq[String]): String =
      phrases.map(phraseNonNegated(toksExpr, nnExpr, _)).mkString("(", " OR ", ")")

    def hasToken(toksExpr: String, word: String): String =
      s"list_contains($toksExpr, ${q(word.toLowerCase)})"

    def isTestDemo(t: String, nn: String): String = anyPhraseNonNegated(t, nn, TestDemoPhrases)
    def isPersonal(t: String, nn: String): String = anyPhraseNonNegated(t, nn, PersonalNonBusinessPhrases)
    def isExperimental(t: String, nn: String): String = anyPhraseNonNegated(t, nn, ExperimentalPhrases)
    def mentionsDarkStore(t: String, nn: String): String = anyPhraseNonNegated(t, nn, DarkStorePhrases)
    def mentionsCounter(t: String, nn: String): String = anyPhraseNonNegated(t, nn, CounterPhrases)
    def mentionsDsWord(t: String): String = hasToken(t, "ds")

    private def rl(expr: String, pattern: String): String =
      s"regexp_matches($expr, ${q(pattern)})"

    def isExcludedEquipment(combinedExpr: String): String = {
      import Regexes._
      val c = s"coalesce($combinedExpr, '')"
      s"(${rl(c, Fire)} OR ${rl(c, Fan)} OR ${rl(c, AirCond)} OR " +
        s"(${rl(c, AcWord)} AND ${rl(c, AcContext)}) OR ${rl(c, Cctv)} OR ${rl(c, StoolOps)})"
    }
  }
}
