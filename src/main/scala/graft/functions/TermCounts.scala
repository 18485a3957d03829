package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document term frequencies in ONE
  * row-local pass — array<struct<term, tf, dl>> where `term` ranges
  * over the document's distinct tokens, `tf` is the token's count and
  * `dl` (repeated per element so no downstream re-aggregation or
  * double-projection is needed) is the document's total token count.
  *
  * Tokenization is defined to be EXACTLY
  * `filter(split(text, "[^\\p{L}\\p{N}]+"), t -> length(t) > 0)`
  * (the [[graft.ops.Search.termsOf]] contract, minus the lower() the
  * caller applies first): tokens are maximal runs of Unicode
  * letter/number codepoints. `TermCountsSpec` pins kernel-vs-expression
  * equality over adversarial Unicode inputs.
  *
  * Why: the inverted-index build previously paid a
  * `groupBy(doc_id, term)` exchange of one row per distinct
  * (doc, term) per map partition plus the Java-regex split of every
  * document. Term frequency is a ROW-LOCAL fact — counting inside the
  * row removes that shuffle outright (optimization guide §2.3/2.4) and
  * replaces the regex NFA walk with direct character-class checks.
  * Token order inside the array is first-appearance (deterministic).
  */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_counts expects a string column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(TermCounts.ElemType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)

  override def prettyName: String = "term_counts"
}

object TermCounts {
  val ElemType: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("dl", LongType, nullable = false)))

  /** True iff the codepoint matches Java regex `[\p{L}\p{N}]` —
    * Unicode general categories L* (all letters: Character.isLetter)
    * and N* (Nd decimal digit, Nl letter number, No other number).
    * Shared with [[Tokens]] so both kernels pin ONE tokenizer. */
  private[functions] def isTokenCp(cp: Int): Boolean = {
    if (Character.isLetter(cp)) true
    else {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }
  }

  def compute(s: UTF8String): ArrayData = {
    // iterate codepoints on the UTF-16 view (supplementary pairs
    // handled by codePointAt), slice tokens back out as UTF8Strings
    val str = s.toString
    val n = str.length
    // insertion-ordered counts: deterministic output order
    val counts = new java.util.LinkedHashMap[String, Array[Long]]()
    var dl = 0L
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      val w = Character.charCount(cp)
      if (isTokenCp(cp)) {
        val start = i
        i += w
        var done = false
        while (i < n && !done) {
          val c2 = str.codePointAt(i)
          if (isTokenCp(c2)) i += Character.charCount(c2) else done = true
        }
        val tok = str.substring(start, i)
        dl += 1L
        val slot = counts.get(tok)
        if (slot == null) counts.put(tok, Array(1L)) else slot(0) += 1L
      } else i += w
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(UTF8String.fromString(e.getKey), e.getValue()(0), dl)
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column = Shim.toColumn(TermCounts(Shim.toExpression(c)))
}
