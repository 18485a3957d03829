package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** N-dimensional Hilbert curve index of integer coordinates — the
  * space-filling cell order the reference supports schema-side
  * (reference: cell_order/tile_order 'hilbert',
  * tiledb/array_schema.py:19-36). Used at WRITE time only: fragments
  * laid out in Hilbert order give multi-dimensional locality, so range
  * queries on ANY dim prefix prune row groups well.
  *
  * Implements Skilling's axes-to-transpose algorithm ("Programming the
  * Hilbert curve", AIP 2004 — public domain) with `bits` per axis;
  * inputs must be pre-scaled to [0, 2^bits). d*bits must fit 63 bits.
  */
case class HilbertIndex(children: Seq[Expression], bits: Int)
    extends Expression with CodegenFallback {

  private val d = children.size
  require(d >= 1 && d * bits <= 63, s"hilbert: $d dims x $bits bits exceeds long")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("hilbert_index expects bigint coordinates")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](d)
    var i = 0
    while (i < d) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertIndex.index(xs, bits)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)

  override def prettyName: String = "hilbert_index"
}

object HilbertIndex {

  /** axes -> Hilbert index (Skilling transpose + bit interleave) */
  def index(x0: Array[Long], bits: Int): Long = {
    val n = x0.length
    val x = java.util.Arrays.copyOf(x0, n)
    val m = 1L << (bits - 1)
    // inverse undo
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave transposed bits, MSB-first across axes
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      i = 0
      while (i < n) {
        out = (out << 1) | ((x(i) >> b) & 1L)
        i += 1
      }
      b -= 1
    }
    out
  }

  def apply(cols: Seq[Column], bits: Int): Column =
    Shim.toColumn(HilbertIndex(cols.map(Shim.toExpression), bits))
}
