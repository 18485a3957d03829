package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass language-ID kernel — the compiled form of
  * [[graft.ops.TextAnalysis.langId]]'s declarative tree.
  *
  * The declarative version (21 per-language `size(filter(tokens, t =>
  * t.isin(words)))` structs inside one `array_max`, 9 script-class
  * `regexp_replace` length diffs, ~40 per-gram `replace` passes) is
  * semantically right but evaluates the higher-order lambdas through
  * interpreted expression trees with NO common-subexpression reuse
  * inside the struct array — measured 94 s over 500k rehearsal docs
  * where the individual pieces sum to ~7 s. This kernel does the
  * identical decision in three tight passes over the string (one
  * code-point pass for script/nonspace counts, one tokenize pass with
  * a shared word→languages hash map, one indexOf pass per gram), built
  * from the SAME tables ([[graft.ops.TextAnalysis.stopwords]] /
  * [[graft.ops.TextAnalysis.charNgrams]] /
  * [[graft.ops.TextAnalysis.scriptLangs]]) that generate the DuckDB
  * oracle — the three implementations can never drift apart silently,
  * and `OpsSpec`'s differential test pins kernel == declarative on the
  * planted multilingual fixture plus randomized strings.
  *
  * Exact-parity notes (each replicates a Spark builtin's quirk):
  *  - script/nonspace counts are in CODE POINTS (an emoji counts 1),
  *    because Spark's `length()` is `UTF8String.numChars`; `\p{IsXxx}`
  *    in Java regex is the Unicode SCRIPT property, i.e.
  *    `Character.UnicodeScript.of`;
  *  - lowercasing calls `UTF8String.toLowerCase` — the very method the
  *    `lower()` builtin runs;
  *  - tokenization mirrors `split(trim(lower(text)), "[ \t\n\f\r]+")`:
  *    trim strips SPACES only; empty tokens (leading tab, trailing
  *    run) match no stopword either way;
  *  - per-gram counts are NON-OVERLAPPING left-to-right occurrences
  *    (what `replace` removes), summed per language and capped at 9;
  *  - tie-break: equal combined scores pick the lexicographically
  *    LARGEST language code (struct-max semantics).
  * One deliberate difference: null text returns null (the declarative
  * tree returned an arbitrary max-by-null-struct language).
  */
case class LangIdK(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_id expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    LangIdK.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LangIdK.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): LangIdK =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}

object LangIdK {
  import graft.ops.TextAnalysis

  private val langs: Array[String] = TextAnalysis.stopwords.keys.toArray.sorted
  private val langU8: Array[UTF8String] = langs.map(UTF8String.fromString)
  private val und = UTF8String.fromString("und")

  /** word -> indices of every language whose stopword list contains it
    * (one shared map replaces 21 isin chains per token). */
  private val wordLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    langs.zipWithIndex.foreach { case (l, i) =>
      TextAnalysis.stopwords(l).foreach { w =>
        val old = m.get(w)
        m.put(w, if (old == null) Array(i) else old :+ i)
      }
    }
    m
  }

  private val gramsByLang: Array[Array[String]] =
    langs.map(l => TextAnalysis.charNgrams.getOrElse(l, Nil).toArray)

  // script-decided languages in CHECK ORDER; each entry lists the
  // UnicodeScript values its regex char class unions
  private val scriptLangU8: Array[UTF8String] =
    TextAnalysis.scriptLangs.map(t => UTF8String.fromString(t._1)).toArray
  /** UnicodeScript sets KEYED BY LANGUAGE CODE — [[scriptSets]] below
    * assembles the check-order array by iterating
    * [[TextAnalysis.scriptLangs]] itself, so reordering or editing the
    * shared table (e.g. its documented Kana-before-Han ordering) can
    * never positionally mismap a kernel verdict: order is inherited,
    * and a membership mismatch in EITHER direction fails class init
    * loudly instead of mislabeling text. */
  private val scriptSetsByLang: Map[String, Array[Character.UnicodeScript]] = {
    import Character.UnicodeScript._
    Map("ja" -> Array(HIRAGANA, KATAKANA), "zh" -> Array(HAN),
      "ko" -> Array(HANGUL), "ar" -> Array(ARABIC), "he" -> Array(HEBREW),
      "hi" -> Array(DEVANAGARI), "th" -> Array(THAI), "el" -> Array(GREEK))
  }
  require(scriptSetsByLang.keySet == TextAnalysis.scriptLangs.map(_._1).toSet,
    "scriptLangs table and kernel script sets diverged: " +
      s"table=${TextAnalysis.scriptLangs.map(_._1)} " +
      s"kernel=${scriptSetsByLang.keys.toSeq.sorted}")
  private val scriptSets: Array[Array[Character.UnicodeScript]] =
    TextAnalysis.scriptLangs.map(t => scriptSetsByLang(t._1)).toArray

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    // pass 1: nonspace + per-script counts in one code-point walk.
    // Counts are CODE POINTS, not UTF-16 units: Spark's length() is
    // UTF8String.numChars, so `length(regexp_replace(...))` counts an
    // emoji as 1 — the differential fuzz caught a unit-counting first
    // draft flipping script verdicts on emoji-adjacent text
    val nScripts = scriptSets.length
    val sc = new Array[Int](nScripts)
    var nonspace = 0
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      // supplementary-plane chars are never whitespace
      if (n == 2 || !isWs(s.charAt(i))) nonspace += 1
      // unpaired surrogates are valid code-point VALUES (script UNKNOWN,
      // exactly how the regex engine treats them) — of() never throws here
      val scr = Character.UnicodeScript.of(cp)
      var k = 0
      var hit = false
      while (k < nScripts && !hit) {
        val set = scriptSets(k)
        var j = 0
        while (j < set.length && !hit) {
          if (set(j) eq scr) { sc(k) += 1; hit = true }
          j += 1
        }
        k += 1
      }
      i += n
    }
    var k = 0
    while (k < nScripts) {
      if (sc(k) > nonspace * 0.3) return scriptLangU8(k)
      k += 1
    }
    // stopword + gram stage on the lowercased text (the exact builtin)
    val low = text.toLowerCase.toString
    var st = 0; var en = low.length
    while (st < en && low.charAt(st) == ' ') st += 1
    while (en > st && low.charAt(en - 1) == ' ') en -= 1
    val swCounts = new Array[Int](langs.length)
    var p = st
    while (p < en) {
      while (p < en && isWs(low.charAt(p))) p += 1
      val t0 = p
      while (p < en && !isWs(low.charAt(p))) p += 1
      if (p > t0) {
        val hit = wordLangs.get(low.substring(t0, p))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { swCounts(hit(j)) += 1; j += 1 }
        }
      }
    }
    val pad = " " + low + " "
    var bestScore = Int.MinValue
    var bestIdx = 0
    var li = 0
    while (li < langs.length) {
      val gs = gramsByLang(li)
      var gsum = 0
      var gi = 0
      while (gi < gs.length && gsum < 9) {
        val g = gs(gi)
        var from = pad.indexOf(g)
        while (from >= 0 && gsum < 9) {
          gsum += 1
          from = pad.indexOf(g, from + g.length)
        }
        gi += 1
      }
      val score = swCounts(li) * 16 + math.min(gsum, 9)
      // langs is sorted ascending, so >= keeps the lex-LARGEST on ties
      if (score >= bestScore) { bestScore = score; bestIdx = li }
      li += 1
    }
    if (bestScore <= 0) und else langU8(bestIdx)
  }

  def apply(c: Column): Column = Shim.toColumn(LangIdK(Shim.toExpression(c)))
}
