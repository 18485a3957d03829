package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Native MinHash kernel: `numHashes` lane minima over a pre-hashed
  * shingle set (`array<long>`, e.g. from [[ShingleHashes]]).
  *
  * The pure-Column formulation (aggregate + zip_with) allocates a
  * 64-element array per shingle step — ~128M transient longs at sf0.1.
  * This kernel is a tight two-loop pass over primitive arrays with a
  * splitmix64-derived seed per lane; zero allocation beyond the output.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 1024, s"numHashes out of range: $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97f4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val hs = arr.toLongArray()
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var lane = 0
    while (lane < numHashes) {
      val seed = splitmix64(lane.toLong)
      var m = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = splitmix64(hs(i) ^ seed)
        if (v < m) m = v
        i += 1
      }
      out(lane) = m
      lane += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, numHashes: Int): Column =
    Shim.toColumn(MinHashSig(Shim.toExpression(c), numHashes))
}
