package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd kernel.
  *
  * Web crawls arrive with the same grapheme in both composed ("é") and
  * decomposed ("e" + U+0301) forms; every downstream hash — exact
  * dedup, shingles, boilerplate keys — treats those as different
  * bytes, so canonical composition must run BEFORE any hashing (the
  * reference ecosystem gets this from numpy/pandas unicode handling;
  * here it is an explicit pipeline stage). Implemented as an
  * Expression rather than a UDF so it stays inside whole-stage codegen
  * as one static call.
  *
  * The overwhelmingly common case — pure-ASCII text — is detected with
  * a byte scan and returns the INPUT buffer untouched: no String
  * decode, no allocation. Non-ASCII strings short-circuit through
  * `Normalizer.isNormalized` (a scan, no allocation) before paying for
  * an actual normalization pass.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got $dt")
  }
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column = Shim.toColumn(NfcNormalize(Shim.toExpression(c)))
}

/** Mojibake repair (the ftfy-style "UTF-8 read as Latin-1/cp1252"
  * fix) as a native codegen'd kernel.
  *
  * The classic crawl corruption: a UTF-8 document decoded with a
  * legacy 8-bit charset turns every non-ASCII code point into 2-4
  * junk characters ("café" -> "cafÃ©", "—" -> "â€”"). The repair is
  * the inverse: map each char back to its byte (identity below
  * U+0100, the cp1252 table for the 27 specials in the 0x80-0x9F
  * window) and strictly re-decode as UTF-8. Three safety gates make
  * the transform conservative:
  *  - every char must map to a byte (a string with real non-Latin
  *    text cannot, and is returned untouched);
  *  - at least one mapped byte must be a UTF-8 lead byte (0xC2-0xF4 —
  *    plain Latin-1 prose has none, and is returned untouched);
  *  - the re-decode is STRICT: any malformed sequence (e.g. a lone
  *    "é" = 0xE9, which is a legit Latin-1 char but an invalid UTF-8
  *    lead) abandons the repair and returns the input.
  * One pass only: doubly-mojibaked text (rare) needs a second
  * application. Pure-ASCII inputs return the input buffer untouched
  * via a byte scan, like [[NfcNormalize]]. Compose with
  * `clean_text`/`nfc_normalize` downstream; repair must run FIRST
  * (NFC of mojibake garbage is still garbage). */
case class FixMojibakeK(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"fix_mojibake expects string, got $dt")
  }
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    FixMojibakeK.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixMojibakeK.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibakeK =
    copy(child = newChild)
  override def prettyName: String = "fix_mojibake"
}

object FixMojibakeK {
  // cp1252 0x80-0x9F window: code point -> byte (the rest of the
  // char-to-byte map is identity below U+0100)
  private val Cp1252: Map[Int, Int] = Map(
    0x20AC -> 0x80, 0x201A -> 0x82, 0x0192 -> 0x83, 0x201E -> 0x84,
    0x2026 -> 0x85, 0x2020 -> 0x86, 0x2021 -> 0x87, 0x02C6 -> 0x88,
    0x2030 -> 0x89, 0x0160 -> 0x8A, 0x2039 -> 0x8B, 0x0152 -> 0x8C,
    0x017D -> 0x8E, 0x2018 -> 0x91, 0x2019 -> 0x92, 0x201C -> 0x93,
    0x201D -> 0x94, 0x2022 -> 0x95, 0x2013 -> 0x96, 0x2014 -> 0x97,
    0x02DC -> 0x98, 0x2122 -> 0x99, 0x0161 -> 0x9A, 0x203A -> 0x9B,
    0x0153 -> 0x9C, 0x017E -> 0x9E, 0x0178 -> 0x9F)

  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    val len = str.length
    val bytes = new Array[Byte](len)
    var hasLead = false
    i = 0
    while (i < len) {
      val c = str.charAt(i).toInt
      val b =
        if (c < 0x100) c
        else Cp1252.getOrElse(c, -1)
      if (b < 0) return s // unmappable char: real non-Latin text
      bytes(i) = b.toByte
      if (b >= 0xC2 && b <= 0xF4) hasLead = true
      i += 1
    }
    if (!hasLead) return s // plain Latin-1 prose, nothing to repair
    try {
      val out = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .decode(java.nio.ByteBuffer.wrap(bytes)) // strict: REPORTs
      UTF8String.fromString(out.toString)
    } catch {
      case _: java.nio.charset.CharacterCodingException => s
    }
  }

  def apply(c: Column): Column = Shim.toColumn(FixMojibakeK(Shim.toExpression(c)))
}
