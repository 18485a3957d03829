package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit hashes of all word `n`-gram
  * windows of a string, in ONE pass over its UTF-8 bytes.
  *
  * Replaces the `transform(sequence(0, size - n), i ->
  * xxhash64(concat_ws(" ", slice(tokens, i+1, n))))` chain, which
  * re-materializes every window as a joined UTF8String — O(tokens * n)
  * characters of allocation per document, the same HOF shape whose
  * char-shingle variant profiled 72x slower than [[ShingleHashes]].
  * Here: per-token polynomial hashes in one byte scan, then a rolling
  * polynomial over the TOKEN hashes (outgoing-token removal via the
  * precomputed multiplier power), murmur3-finalized — zero per-window
  * allocation.
  *
  * Tokenization parity: splits on runs of the repo's tokenizer class
  * `[ \t\n\f\r]` (TextAnalysis.WsClass — NOT \x0B) after trimming the
  * same characters, all ASCII so the byte-level scan is UTF-8-exact.
  * Two windows hash equal iff their single-space-joined token strings
  * are equal (modulo a ~2^-64 polynomial collision — the same trade
  * every gram join in this repo already makes). STRICT grams: fewer
  * than `n` tokens yields an empty array.
  *
  * `distinct = false` keeps one hash per window in TOKEN-POSITION
  * ORDER (index i = the window starting at token i — what
  * [[graft.ops.Curation.removeDupSpans]] posexplodes); `distinct =
  * true` returns the sorted-distinct set ([[graft.ops.Curation]]'s
  * contamination/dupSpans family).
  */
case class WordGramHashes(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 2 && n <= 256, s"word-gram width out of range: $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_gram_hashes expects a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WordGramHashes.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGramHashes.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordGramHashes =
    copy(child = newChild)

  override def prettyName: String = "word_gram_hashes"
}

object WordGramHashes {
  private final val PRIME = 0x100000001b3L // token-byte polynomial
  private final val GPRIME = 0x9e3779b97f4a7c15L | 1L // token-hash polynomial

  private def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  // the tokenizer class [ \t\n\f\r] — all ASCII, so no UTF-8
  // continuation byte (>= 0x80) can alias a separator
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r'

  def compute(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && isWs(bytes(lo))) lo += 1
    while (hi > lo && isWs(bytes(hi - 1))) hi -= 1
    // pass 1: per-token polynomial hashes (finalized so the gram
    // polynomial sees avalanche-mixed operands)
    var tokHashes = new Array[Long](16)
    var t = 0
    var i = lo
    while (i < hi) {
      var h = 0L
      while (i < hi && !isWs(bytes(i))) {
        h = h * PRIME + (bytes(i) & 0xFFL); i += 1
      }
      if (t == tokHashes.length)
        tokHashes = java.util.Arrays.copyOf(tokHashes, t * 2)
      tokHashes(t) = fmix64(h); t += 1
      while (i < hi && isWs(bytes(i))) i += 1
    }
    if (t < n) return new GenericArrayData(Array.empty[Long])
    // pass 2: rolling polynomial over the token hashes
    var pow = 1L
    i = 1
    while (i < n) { pow *= GPRIME; i += 1 }
    val out = new Array[Long](t - n + 1)
    var g = 0L
    i = 0
    while (i < t) {
      if (i >= n) g -= tokHashes(i - n) * pow
      g = g * GPRIME + tokHashes(i)
      if (i >= n - 1) out(i - n + 1) = fmix64(g)
      i += 1
    }
    if (!distinct) return new GenericArrayData(out)
    java.util.Arrays.sort(out)
    var w = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  def apply(c: Column, n: Int, distinct: Boolean): Column =
    Shim.toColumn(WordGramHashes(Shim.toExpression(c), n, distinct))
}
