package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** English Snowball stemmer ("Porter2" — M.F. Porter, snowballstem.org,
  * public algorithm spec), implemented for the `word_stem` scalar.
  *
  * Reference surface: Presto `word_stem(word[, lang])`
  * (`presto-main/.../scalar/WordStemFunction.java:82`), which delegates to
  * Lucene's Snowball `EnglishStemmer` WITHOUT case folding; this is the
  * same algorithm (exception lists, R1/R2 regions, y→Y marking, the
  * short-word rule), so verbatim Presto SQL gets identical stems —
  * including the pass-through of uppercase input (uppercase letters are
  * consonants to the algorithm, exactly as in Snowball). English-only,
  * matching the overwhelmingly common call. The stemmer is a pure
  * string→string function, so it rides whole-stage codegen as a static
  * call (see [[WordStem]]).
  */
object Porter2Stemmer {

  /** Entry point for generated code: UTF8String in/out. Top-level Scala
    * object methods compile to static forwarders, so janino-generated Java
    * calls this directly without reflection. */
  def stemUTF8(s: UTF8String): UTF8String =
    UTF8String.fromString(stem(s.toString))

  // exception list 1: stemmed irregularly (left) or invariant (right half)
  private val exception1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  // exception list 2: checked after step 1a; these words stop as-is
  private val exception2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  // marked Y (y in vowel position, set by the prelude) is a consonant;
  // uppercase input has no vowels at all, as in Snowball
  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
  private def isCons(w: CharSequence, i: Int): Boolean = !isVowel(w.charAt(i))

  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val validLi = "cdeghkmnrt"

  /** gopast v, gopast non-v from `from`: the start of the next region. */
  private def regionAfter(w: String, from: Int): Int = {
    var i = from
    val n = w.length
    while (i < n && isCons(w, i)) i += 1 // gopast a vowel ...
    if (i < n) i += 1
    while (i < n && !isCons(w, i)) i += 1 // ... then past a non-vowel
    if (i < n) i += 1
    i
  }

  /** shortv at cursor c: the chars ending at c form a short syllable —
    * non-vowel(not w/x/Y) after a vowel after a non-vowel, or a vowel at
    * the start of the word followed by a non-vowel. */
  private def shortSyllableAt(w: String, c: Int): Boolean =
    (c >= 3 && isCons(w, c - 1) && "wxY".indexOf(w.charAt(c - 1)) < 0 &&
      !isCons(w, c - 2) && isCons(w, c - 3)) ||
      (c == 2 && isCons(w, 1) && !isCons(w, 0))

  private def hasVowel(w: String, until: Int): Boolean = {
    var i = 0
    while (i < until) { if (!isCons(w, i)) return true; i += 1 }
    false
  }

  private def longestSuffix(w: String, sufs: Seq[String]): String =
    sufs.find(w.endsWith) match { case Some(s) => s; case None => null }

  // ordered longest-first; once the longest matching suffix is picked its
  // region condition decides — a failed condition does NOT fall back to a
  // shorter suffix (Snowball among() semantics)
  private val sufs1b = Seq("eedly", "ingly", "edly", "eed", "ing", "ed")
  private val sufs2 = Seq(
    "ational", "ization", "iveness", "fulness", "ousness",
    "tional", "biliti", "lessli",
    "entli", "ousli", "fulli", "alism", "aliti", "ation", "iviti",
    "enci", "anci", "abli", "izer", "ator", "alli",
    "ogi", "bli", "li")
  private val map2 = Map(
    "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "tional" -> "tion",
    "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
    "ousli" -> "ous", "fulli" -> "ful", "alism" -> "al", "aliti" -> "al",
    "ation" -> "ate", "iviti" -> "ive", "enci" -> "ence", "anci" -> "ance",
    "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
    "ogi" -> "og", "bli" -> "ble", "li" -> "")
  private val sufs3 = Seq(
    "ational", "tional", "alize", "icate", "iciti", "ative", "ical",
    "ness", "ful")
  private val map3 = Map(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
    "ness" -> "", "ful" -> "")
  private val sufs4 = Seq(
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
    "al", "er", "ic")

  def stem(word: String): String = {
    exception1.get(word) match {
      case Some(r) => return r
      case None =>
    }
    if (word.length <= 2) return word

    // prelude: strip a leading apostrophe; mark y in vowel position as Y
    var w = if (word.charAt(0) == '\'') word.substring(1) else word
    val sb = new StringBuilder(w)
    if (sb.nonEmpty && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && !isCons(sb, i - 1)) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    // mark regions (positions are prefix offsets: tail edits keep them valid)
    val p1 =
      Seq("gener", "commun", "arsen").find(w.startsWith) match {
        case Some(pre) => pre.length
        case None => regionAfter(w, 0)
      }
    val p2 = regionAfter(w, p1)

    // step 0: 's' / 's / '
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s") && hasVowel(w, w.length - 2)) w = w.dropRight(1)

    if (exception2.contains(w)) return postlude(w)

    // step 1b
    val s1b = longestSuffix(w, sufs1b)
    if (s1b == "eed" || s1b == "eedly") {
      if (w.length - s1b.length >= p1) w = w.dropRight(s1b.length) + "ee"
    } else if (s1b != null) {
      if (hasVowel(w, w.length - s1b.length)) {
        w = w.dropRight(s1b.length)
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
        else if (w.length >= 2 && doubles.contains(w.takeRight(2)))
          w = w.dropRight(1)
        else if (w.length == p1 && shortSyllableAt(w, w.length)) w += "e"
      }
    }

    // step 1c: final y/Y after a non-vowel that isn't the first letter
    if (w.length >= 3 && (w.endsWith("y") || w.endsWith("Y")) &&
      isCons(w, w.length - 2))
      w = w.dropRight(1) + "i"

    // step 2 (suffix must lie in R1)
    val s2 = longestSuffix(w, sufs2)
    if (s2 != null && w.length - s2.length >= p1) {
      val stemPart = w.dropRight(s2.length)
      s2 match {
        case "ogi" =>
          if (stemPart.endsWith("l")) w = stemPart + "og"
        case "li" =>
          if (stemPart.nonEmpty && validLi.indexOf(stemPart.last) >= 0)
            w = stemPart
        case _ => w = stemPart + map2(s2)
      }
    }

    // step 3 (in R1; ative additionally requires R2)
    val s3 = longestSuffix(w, sufs3)
    if (s3 != null && w.length - s3.length >= p1) {
      if (s3 != "ative" || w.length - s3.length >= p2)
        w = w.dropRight(s3.length) + map3(s3)
    }

    // step 4 (in R2; ion only after s/t)
    val s4 = longestSuffix(w, sufs4)
    if (s4 != null && w.length - s4.length >= p2) {
      if (s4 != "ion" || (w.length > 3 &&
        "st".indexOf(w.charAt(w.length - 4)) >= 0))
        w = w.dropRight(s4.length)
    }

    // step 5
    if (w.endsWith("e")) {
      val at = w.length - 1
      if (at >= p2 || (at >= p1 && !shortSyllableAt(w, at))) w = w.dropRight(1)
    } else if (w.endsWith("l") && w.length - 1 >= p2 &&
      w.length >= 2 && w.charAt(w.length - 2) == 'l') {
      w = w.dropRight(1)
    }

    postlude(w)
  }

  private def postlude(w: String): String =
    if (w.indexOf('Y') < 0) w else w.replace('Y', 'y')
}

/** `word_stem(word)` as a native expression: stays inside whole-stage
  * codegen as one static call per row (no UDF serialization, no
  * interpreted fallback). Non-string inputs are rejected at analysis. */
case class WordStem(child: Expression) extends UnaryExpression {

  override def prettyName: String = "word_stem"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_stem expects a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Porter2Stemmer.stemUTF8(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Porter2Stemmer.stemUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode normalization (Presto `normalize(string[, form])`,
  * `presto-main/.../scalar/StringFunctions.java`): delegates to
  * `java.text.Normalizer` as a static codegen call. */
case class NormalizeString(child: Expression, form: String)
    extends UnaryExpression {

  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"normalize: unknown form $form")

  override def prettyName: String = "normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize expects a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Stemmer {
  def wordStem(c: Column): Column =
    ColumnBridge.toCol(WordStem(ColumnBridge.toExpr(c)))
  def normalize(c: Column, form: String = "NFC"): Column =
    ColumnBridge.toCol(NormalizeString(ColumnBridge.toExpr(c), form))
}
