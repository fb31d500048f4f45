package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Porter stemmer (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3), 1980 — the public-domain algorithm
  * Snowball's English stemmer descends from), as one tight JVM pass per
  * token.
  *
  * This is the DOCUMENTED NON-ORACLE stemming option (VERDICT r5 #8):
  * the oracle-checked search family stays on the Harman S-stemmer
  * (TextOps.stemToken), whose three rules both engines express
  * identically — full derivational stemming is not reproducible in
  * DuckDB SQL, so queries using this stemmer are covered by ScalaTest
  * specs (vocabulary pairs from the paper itself) instead of the DuckDB
  * hash gate. It closes the remaining Mongo `$text` fidelity gap
  * (api.py:26 — Mongo stems derivationally, so "generalizations"
  * matches "general"; the S-stemmer only folds plurals).
  *
  * Steps follow the paper exactly: 1a plurals; 1b -eed/-ed/-ing with
  * the at/bl/iz, double-consonant and CVC fix-ups; 1c y→i; 2/3 the
  * suffix-mapping tables gated on measure m>0; 4 suffix drops gated on
  * m>1 (ion only after s/t); 5a final-e removal; 5b -ll reduction.
  */
object PorterStemmer {

  /** True when w(i) is a consonant under Porter's definition ('y' is a
    * consonant at position 0 or after a vowel). */
  private def cons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !cons(w, i - 1)
    case _ => true
  }

  /** Porter's measure: the m in [C](VC)^m[V]. */
  private def measure(w: String): Int = {
    val n = w.length
    var m = 0
    var i = 0
    while (i < n && cons(w, i)) i += 1
    while (i < n) {
      while (i < n && !cons(w, i)) i += 1
      if (i < n) {
        m += 1
        while (i < n && cons(w, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    (0 until w.length).exists(i => !cons(w, i))

  /** Ends in a double consonant. */
  private def doubleC(w: String): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) && cons(w, n - 1)
  }

  /** Ends consonant-vowel-consonant where the final consonant is not
    * w, x or y (the "add back an e" test). */
  private def cvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && cons(w, n - 3) && !cons(w, n - 2) && cons(w, n - 1) && {
      val c = w.charAt(n - 1)
      c != 'w' && c != 'x' && c != 'y'
    }
  }

  private[graft] val step2: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
    "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
    "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private[graft] val step3: Seq[(String, String)] = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  /** Step-4 suffixes, longest-first where one ends another, so a linear
    * first-match scan agrees with the paper's longest-match switch. */
  private[graft] val step4: Seq[String] = Seq(
    "ement", "ment", "ent", "ance", "ence", "able", "ible", "ant",
    "ion", "ism", "ate", "iti", "ous", "ive", "ize", "ou", "al", "er",
    "ic")

  /** First matching mapping wins; the m-condition is checked once on
    * the matched (longest) suffix and shorter ones are not retried —
    * the paper's switch semantics. */
  private def mapSuffix(w: String, table: Seq[(String, String)]): String = {
    table.find { case (suf, _) => w.endsWith(suf) } match {
      case Some((suf, rep)) =>
        val stem = w.substring(0, w.length - suf.length)
        if (measure(stem) > 0) stem + rep else w
      case None => w
    }
  }

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word
    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)
    // step 1b
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else {
      var stripped = false
      if (w.endsWith("ed") && containsVowel(w.dropRight(2))) {
        w = w.dropRight(2); stripped = true
      } else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) {
        w = w.dropRight(3); stripped = true
      }
      if (stripped) {
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz"))
          w += "e"
        else if (doubleC(w) && !"lsz".contains(w.charAt(w.length - 1)))
          w = w.dropRight(1)
        else if (measure(w) == 1 && cvc(w)) w += "e"
      }
    }
    // step 1c
    if (w.endsWith("y") && containsVowel(w.dropRight(1)))
      w = w.dropRight(1) + "i"
    // steps 2-3
    w = mapSuffix(w, step2)
    w = mapSuffix(w, step3)
    // step 4
    step4.find(w.endsWith) match {
      case Some(suf) =>
        val stem = w.substring(0, w.length - suf.length)
        val ok = measure(stem) > 1 &&
          (suf != "ion" || (stem.nonEmpty &&
            (stem.endsWith("s") || stem.endsWith("t"))))
        if (ok) w = stem
      case None =>
    }
    // step 5a
    if (w.endsWith("e")) {
      val a = w.dropRight(1)
      val m = measure(a)
      if (m > 1 || (m == 1 && !cvc(a))) w = a
    }
    // step 5b
    if (w.endsWith("ll") && measure(w) > 1) w = w.dropRight(1)
    w
  }

  /** UTF8String bridge (static: called from generated code). */
  def stemU(s: UTF8String): UTF8String =
    UTF8String.fromString(stem(s.toString))
}

/** porter_stem(str) — Porter-stemmed token (see [[PorterStemmer]]). */
case class PorterStemExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "porter_stem"
  override protected def nullSafeEval(input: Any): Any =
    PorterStemmer.stemU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PorterStemmer.stemU($c)")
  override protected def withNewChildInternal(newChild: Expression): PorterStemExpr =
    copy(child = newChild)
}
