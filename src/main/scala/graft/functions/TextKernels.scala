package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits) of a token array's value distribution — the
  * kernel form of the sort + run-length `aggregate` fold in
  * [[graft.ops.TextAnalysis.wordEntropy]]. The HOF fold allocated a
  * struct accumulator per element through an interpreted lambda
  * (measured 65 s over 50k docs at the 10x rehearsal — 1.3 ms/doc for
  * what is one sort and one pass); this kernel does the identical
  * arithmetic in primitive loops: sort by UTF8String binary order
  * (= `sort_array`'s StringType ordering), walk runs left to right,
  * each run of length c adding `(c/n) * (log(n/c) / log(2))` — the
  * same op sequence as `(c/n) * log(2.0, n/c)` up to the JDK log
  * intrinsic (Spark's Logarithm takes a different log path; observed
  * 1-ulp drift — the `text_entropy` oracle contract is round-6,
  * six orders looser, and `VectorKernelsSpec` pins <1e-12).
  * Arrays with fewer than 2 tokens score 0.0 (one-point distribution);
  * a null element nulls the row (the HOF's comparison would too). */
case class WordEntropyK(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_entropy expects array<string>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordEntropyK.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("entR")
      s"""java.lang.Double $r = graft.functions.WordEntropyK.compute($a);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordEntropyK =
    copy(child = newChild)
  override def prettyName: String = "word_entropy"
}

object WordEntropyK {
  private val Ln2 = math.log(2.0)

  def compute(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    if (n <= 1) return 0.0
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      toks(i) = arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
    val nd = n.toDouble
    var h = 0.0
    var run = 1L
    i = 1
    while (i < n) {
      if (toks(i).equals(toks(i - 1))) run += 1
      else {
        h += (run.toDouble / nd) * (math.log(nd / run.toDouble) / Ln2)
        run = 1L
      }
      i += 1
    }
    h + (run.toDouble / nd) * (math.log(nd / run.toDouble) / Ln2)
  }

  def apply(tokens: Column): Column =
    Shim.toColumn(WordEntropyK(Shim.toExpression(tokens)))
}
