package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data curation: token
  * counting, quality scoring, language-ID scoring, and rolling-hash
  * fingerprinting. All pure column expressions (codegen'd, shuffle-free
  * per-row) — they compose into any scan without changing the plan
  * shape, so they cost one projection at any corpus size.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segment count: alphanumeric runs + each
    * non-space symbol char counts as its own segment. (No regex
    * lookarounds — RE2-based engines must reproduce this.) */
  def segmentCount(text: Column): Column =
    size(filter(split(text, "[^a-z0-9]+"), t => t =!= "")) +
      length(regexp_replace(text, "[a-z0-9 ]", ""))

  /** Distinct-token ratio (repetitiveness signal), 0 for empty docs. */
  def uniqueRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0, size(array_distinct(t)) / size(t).cast("double")).otherwise(0.0)
  }

  /** Stopword ratio against a fixed profile. */
  def stopwordRatio(text: Column, stop: Seq[String]): Column = {
    val t = tokens(text)
    val stopArr = array(stop.map(lit): _*)
    when(size(t) > 0,
      size(filter(t, x => array_contains(stopArr, x))) / size(t).cast("double"))
      .otherwise(0.0)
  }

  /** Mean token length (characters), 0 for empty docs. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) > 0,
      aggregate(t, lit(0), (acc, x) => acc + length(x)) / size(t).cast("double"))
      .otherwise(0.0)
  }

  /** Composite quality score: rewards lexical diversity and
    * connective-word presence, penalizes degenerate token lengths.
    * Integer weights only — the oracle reproduces the double math
    * bit-for-bit. */
  def qualityScore(text: Column, stop: Seq[String]): Column =
    uniqueRatio(text) * 2 + stopwordRatio(text, stop) * 3 -
      abs(meanTokenLen(text) - 5.0) / 5.0

  /** Character n-gram language profiles (Cavnar–Trenkle n-gram
    * categorization): the highest-frequency character trigrams of each
    * language per published frequency tables, space-padded so word
    * boundaries count ("he " ≠ "he" mid-word). zh profiles on single
    * characters — the top characters of modern Chinese text — since
    * trigram statistics need segmentation Chinese doesn't mark. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", " th", "he ", "and", "nd ", " an", "ing", "ng ", " of", "of ", "ed ", "er "),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", "el ", "que", " qu", "ue ", " en", "en ", "ar "),
    "de" -> Seq("en ", "er ", "der", " de", "die", " di", "ie ", "und", " un", "nd ", "sch", "ein"),
    "fr" -> Seq(" de", "de ", "le ", " le", "ent", "nt ", "es ", " la", "la ", " et", "et ", "ion"),
    "zh" -> Seq("的", "是", "了", "在", "我", "中"))

  /** Per-language profile score: total occurrences of the language's
    * profile grams in the space-padded text. Occurrences are counted
    * with the replace trick — (len(t) − len(replace(t, g, ''))) ∕
    * len(g) — a pure per-row expression chain: no shuffle, no UDF,
    * O(|profiles|·|text|) map-side work at any corpus size. */
  private def profileScore(padded: Column, grams: Seq[String]): Column =
    grams.map { g =>
      ((length(padded) - length(replace(padded, lit(g), lit("")))) / g.length).cast("int")
    }.reduce(_ + _)

  /** The five per-language profile scores, alphabetical by language
    * code, as named columns. Intended for the two-projection pattern:
    * select these once (their replace() chains stay in one codegen'd
    * Project), then feed attribute references into [[argmaxLang]] in
    * the projection above. CollapseProject will NOT re-inline them —
    * each score alias is a non-cheap expression referenced more than
    * once by the argmax — so the plan keeps one copy of each chain
    * without an explicit Exchange fence. */
  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), text, lit(" "))
    LangProfiles.sortBy(_._1).map { case (lang, grams) =>
      lang -> profileScore(padded, grams)
    }
  }

  /** Argmax over (lang, score) pairs: ties → alphabetical profile
    * order, zero hits → "und". Pass plain attribute references (the
    * [[langScores]] columns materialized one projection below) — with
    * attributes the inlined `greatest` in every CASE branch is free;
    * with raw score chains it duplicates them ~12× each (measured:
    * 594 replace() nodes in one Project, 2.3× the query time). */
  def argmaxLang(scores: Seq[(String, Column)]): Column = {
    val sorted = scores.sortBy(_._1)
    val best = sorted.map(_._2).reduce((a, b) => greatest(a, b))
    sorted.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(best > 0 && s === best, lang).otherwise(acc)
    }
  }

  /** Predicted language: argmax profile score, ties → alphabetical
    * profile order, zero hits → "und".
    *
    * Single-Column convenience form: one `aggregate` over an array of
    * (score, lang) structs, so each profile-score chain appears
    * exactly once in the expression tree. The HOF keeps the tree
    * small but takes the projection off the codegen path — for hot
    * queries prefer [[langScores]] + [[argmaxLang]] across two
    * projections, which stays whole-stage-codegen'd AND single-copy.
    * The alphabetical iteration with a strict `>` keeps the first
    * (alphabetically smallest) maximum — identical tie-break — and
    * the (0, "und") seed reproduces the zero-hits fallback. */
  def langId(text: Column): Column = {
    val scored = array(langScores(text).map { case (lang, s) =>
      struct(s.as("s"), lit(lang).as("lang"))
    }: _*)
    aggregate(
      scored,
      struct(lit(0).as("s"), lit("und").as("lang")),
      (acc, x) => when(x("s") > acc("s"), x).otherwise(acc)
    )("lang")
  }

  /** Polynomial rolling-hash fingerprint of the character stream:
    * h = fold(h·31 + ascii(c)) mod P. Equal fingerprints ⇔ equal
    * normalized text (up to hash collisions) — an order-sensitive
    * complement to MinHash. */
  def fingerprint(text: Column, p: Long = 4294967311L): Column =
    aggregate(
      transform(filter(split(text, ""), c => c =!= ""), c => ascii(c).cast("long")),
      lit(0L), (acc, x) => (acc * 31 + x) % p)
}
