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
