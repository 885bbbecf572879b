package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Snowball English ("Porter2") stemmer behind the Trino dialect's
  * `word_stem` (Trino docs: string functions; the reference delegates
  * to the remote engine, which stems with the Snowball english
  * stemmer). Implemented from the published Snowball english algorithm
  * — regions R1/R2, the special gener-/commun-/arsen- prefixes, the
  * exceptional-form and invariant lists, steps 0–5 with longest-suffix
  * matching. Input is lowercased first (Snowball is defined over
  * lowercase words); stems come back lowercase.
  *
  * StaticInvoke target: codegen emits a plain static call, no UDF.
  */
object Porter2 {

  def stemUtf8(w: UTF8String): UTF8String =
    UTF8String.fromString(stem(w.toString))

  def stemLang(w: UTF8String, lang: UTF8String): UTF8String = {
    val l = lang.toString.toLowerCase(java.util.Locale.ROOT)
    require(l == "en", s"word_stem: language '$l' is not supported (only 'en')")
    stemUtf8(w)
  }

  private val exceptional = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl")

  private val invariant = Set(
    "sky", "news", "howe", "atlas", "cosmos", "bias", "andes")

  private val afterStep1a = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt".toSet

  // after Y-marking, remaining 'y' chars are vowels; 'Y' is a consonant
  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  /** R1 = region after the first non-vowel following a vowel (with the
    * gener-/commun-/arsen- prefix override); R2 = the same rule applied
    * within R1. Positions are prefix offsets, stable across the
    * suffix-only edits the steps make. */
  private def regionAfter(w: String, start: Int): Int = {
    var i = start
    while (i < w.length && !isVowel(w.charAt(i))) i += 1
    while (i < w.length && isVowel(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  private def regionR1(w: String): Int = {
    if (w.startsWith("gener")) return 5
    if (w.startsWith("commun")) return 6
    if (w.startsWith("arsen")) return 5
    regionAfter(w, 0)
  }

  /** A short syllable: vowel + non-vowel (≠ w, x, Y) preceded by a
    * non-vowel; or a vowel at the start of the word + a non-vowel. */
  private def endsWithShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w.charAt(0)) && !isVowel(w.charAt(1))
    else if (n >= 3) {
      val c = w.charAt(n - 1)
      isVowel(w.charAt(n - 2)) && !isVowel(c) &&
        c != 'w' && c != 'x' && c != 'Y' && !isVowel(w.charAt(n - 3))
    } else false
  }

  def stem(input: String): String = {
    if (input == null) return null
    var w = input.toLowerCase(java.util.Locale.ROOT)
    if (w.length <= 2) return w
    if (w.charAt(0) == '\'') w = w.substring(1)
    exceptional.get(w).foreach(s => return s)
    if (invariant(w)) return w
    if (w.length <= 2) return w

    // mark consonant y (initial, or after a vowel) as Y
    val sb = new StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString
    val r1 = regionR1(w)
    val r2 = regionAfter(w, r1)
    def inR1(sufLen: Int): Boolean = w.length - sufLen >= r1
    def inR2(sufLen: Int): Boolean = w.length - sufLen >= r2

    // step 0: longest of  's'  /  's  /  '
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s") &&
        w.length >= 3 && w.substring(0, w.length - 2).exists(isVowel))
      w = w.dropRight(1)

    if (afterStep1a(w)) return w.replace('Y', 'y')

    // step 1b (longest suffix)
    val oneB = Seq("eedly", "ingly", "edly", "eed", "ing", "ed").find(w.endsWith)
    oneB match {
      case Some(s @ ("eed" | "eedly")) =>
        if (inR1(s.length)) w = w.dropRight(s.length) + "ee"
      case Some(s) =>
        val stemPart = w.dropRight(s.length)
        if (stemPart.exists(isVowel)) {
          w = stemPart
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (w.length >= 2 && doubles(w.takeRight(2))) w = w.dropRight(1)
          else if (endsWithShortSyllable(w) && r1 >= w.length) w += "e"
        }
      case None =>
    }

    // step 1c: y/Y → i after a non-vowel that is not the first letter
    if (w.length > 2 && (w.last == 'y' || w.last == 'Y') &&
        !isVowel(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // step 2 (suffix must lie in R1); longest match wins, and a matched
    // suffix whose condition fails ends the step (no shorter retry)
    val step2 = Seq(
      "ational" -> "ate", "fulness" -> "ful", "iveness" -> "ive",
      "ization" -> "ize", "ousness" -> "ous",
      "biliti" -> "ble", "lessli" -> "less", "tional" -> "tion",
      "alism" -> "al", "aliti" -> "al", "ation" -> "ate", "entli" -> "ent",
      "fulli" -> "ful", "iviti" -> "ive", "ousli" -> "ous",
      "abli" -> "able", "alli" -> "al", "anci" -> "ance", "ator" -> "ate",
      "enci" -> "ence", "izer" -> "ize",
      "bli" -> "ble", "ogi" -> "og", "li" -> "")
    step2.find { case (s, _) => w.endsWith(s) }.foreach { case (s, rep) =>
      val ok = s match {
        case "ogi" => inR1(3) && w.length > 3 && w.charAt(w.length - 4) == 'l'
        case "li" => inR1(2) && w.length > 2 && liEnding(w.charAt(w.length - 3))
        case _ => inR1(s.length)
      }
      if (ok) w = w.dropRight(s.length) + rep
    }

    // step 3 (in R1; ative additionally requires R2)
    val step3 = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "",
      "ical" -> "ic", "ness" -> "", "ful" -> "")
    step3.find { case (s, _) => w.endsWith(s) }.foreach { case (s, rep) =>
      val ok = if (s == "ative") inR2(5) else inR1(s.length)
      if (ok) w = w.dropRight(s.length) + rep
    }

    // step 4 (in R2; ion only after s/t)
    val step4 = Seq(
      "ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
      "al", "er", "ic")
    step4.find(w.endsWith).foreach { s =>
      val ok =
        if (s == "ion")
          inR2(3) && w.length > 3 &&
            (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't')
        else inR2(s.length)
      if (ok) w = w.dropRight(s.length)
    }

    // step 5
    if (w.endsWith("e") &&
        (inR2(1) || (inR1(1) && !endsWithShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("l") && inR2(1) &&
        w.length >= 2 && w.charAt(w.length - 2) == 'l')
      w = w.dropRight(1)

    w.replace('Y', 'y')
  }
}
