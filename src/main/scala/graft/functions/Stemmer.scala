package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemmer (Porter 1980, "An algorithm for suffix stripping" —
  * the published algorithm; public knowledge), implemented for the
  * `word_stem` scalar.
  *
  * Reference surface: Presto `word_stem(word[, lang])`
  * (`presto-main/.../scalar/WordStemFunction.java:82`), which delegates to
  * Lucene snowball stemmers; English-only here, matching the overwhelmingly
  * common call. The stemmer is a pure string→string function, so it rides
  * whole-stage codegen as a static call (see [[WordStem]]) — per-row cost
  * is one small allocation-free scan for the common no-suffix case.
  */
object PorterStemmer {

  /** Entry point for generated code: UTF8String in/out. Top-level Scala
    * object methods compile to static forwarders, so janino-generated Java
    * calls this directly without reflection. */
  def stemUTF8(s: UTF8String): UTF8String =
    UTF8String.fromString(stem(s.toString))

  def stem(word: String): String = {
    val w = word.toLowerCase
    if (w.length <= 2) return w
    step5(step4(step3(step2(step1c(step1b(step1a(w)))))))
  }

  /** Porter's consonant definition: not a vowel, and `y` is a consonant
    * only when not preceded by a consonant. */
  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** m in [C](VC){m}[V]: the number of vowel→consonant alternations. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && isCons(w, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(w, i)) i += 1
      if (i < n) { m += 1; while (i < n && isCons(w, i)) i += 1 }
    }
    m
  }

  private def hasVowel(w: String): Boolean =
    (0 until w.length).exists(!isCons(w, _))

  /** *d: ends with a double consonant. */
  private def endsDoubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isCons(w, w.length - 1)

  /** *o: ends consonant-vowel-consonant where the final consonant is not
    * w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && isCons(w, n - 3) && !isCons(w, n - 2) && isCons(w, n - 1) &&
      "wxy".indexOf(w.charAt(n - 1)) < 0
  }

  /** Step 1a: plurals. SSES→SS, IES→I, SS→SS, S→"". */
  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  /** Step 1b: -ed/-ing, with the AT/BL/IZ / double-consonant / cvc+e
    * cleanup when a removal happened. */
  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      val s = w.dropRight(3)
      if (measure(s) > 0) s + "ee" else w
    } else {
      val stripped =
        if (w.endsWith("ed") && hasVowel(w.dropRight(2))) w.dropRight(2)
        else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) w.dropRight(3)
        else null
      if (stripped == null) w
      else if (stripped.endsWith("at") || stripped.endsWith("bl") ||
        stripped.endsWith("iz")) stripped + "e"
      else if (endsDoubleCons(stripped) &&
        "lsz".indexOf(stripped.charAt(stripped.length - 1)) < 0)
        stripped.dropRight(1)
      else if (measure(stripped) == 1 && endsCvc(stripped)) stripped + "e"
      else stripped
    }
  }

  /** Step 1c: (*v*) Y → I. */
  private def step1c(w: String): String =
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w.dropRight(1) + "i"
    else w

  /** (suffix, replacement) pairs applied when m(stem) > condition; at most
    * one rule fires per step (first matching suffix wins, even if its
    * m-condition then fails — per the paper). */
  private def applyRules(w: String, rules: Seq[(String, String)],
                         minMeasure: Int): String = {
    rules.find { case (suf, _) => w.endsWith(suf) } match {
      case Some((suf, rep)) =>
        val s = w.dropRight(suf.length)
        if (measure(s) > minMeasure - 1) s + rep else w
      case None => w
    }
  }

  // Longer suffixes listed before their tails (ational before tional,
  // iveness before ness families, ement before ment before ent in step 4).
  private val rules2 = Seq(
    "ational" -> "ate", "tional" -> "tion", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "ization" -> "ize",
    "biliti" -> "ble", "ousli" -> "ous", "entli" -> "ent", "alli" -> "al",
    "ation" -> "ate", "aliti" -> "al", "iviti" -> "ive", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alism" -> "al",
    "ator" -> "ate", "eli" -> "e")

  private val rules3 = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val rules4 = Seq(
    "ement" -> "", "ance" -> "", "ence" -> "", "able" -> "", "ible" -> "",
    "ment" -> "", "ant" -> "", "ent" -> "", "ism" -> "", "ate" -> "",
    "iti" -> "", "ous" -> "", "ive" -> "", "ize" -> "", "ion" -> "",
    "al" -> "", "er" -> "", "ic" -> "", "ou" -> "")

  private def step2(w: String): String = applyRules(w, rules2, 1)
  private def step3(w: String): String = applyRules(w, rules3, 1)

  /** Step 4 (m>1): plain removals, except ION requires the remaining stem
    * to end in s or t. */
  private def step4(w: String): String = {
    rules4.find { case (suf, _) => w.endsWith(suf) } match {
      case Some((suf, _)) =>
        val s = w.dropRight(suf.length)
        val ok = measure(s) > 1 &&
          (suf != "ion" || (s.nonEmpty && "st".indexOf(s.last) >= 0))
        if (ok) s else w
      case None => w
    }
  }

  /** Step 5a: (m>1) E→ ; (m=1 and not *o) E→ . Step 5b: (m>1, *d, ends
    * l) → drop one l. */
  private def step5(w: String): String = {
    val a =
      if (w.endsWith("e")) {
        val s = w.dropRight(1)
        val m = measure(s)
        if (m > 1 || (m == 1 && !endsCvc(s))) s else w
      } else w
    if (a.endsWith("ll") && measure(a.dropRight(1)) > 1) a.dropRight(1)
    else a
  }
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
    PorterStemmer.stemUTF8(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PorterStemmer.stemUTF8($c)")

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
