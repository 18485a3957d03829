package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernels for the vector-similarity hot paths.
  *
  * The higher-order-function formulations (`aggregate(zip_with(...))`)
  * are declarative but NOT whole-stage-codegen'd: Spark evaluates the
  * lambda per array element through an interpreted expression tree, so
  * a dot product costs an expression-eval per component. These kernels
  * do the same arithmetic — bit-identically, including Spark's exact
  * xxhash64 seed chain — in one tight primitive loop per row, emitted
  * as a single static call inside whole-stage codegen (same pattern as
  * [[ShingleHashes]] / [[MinHashSig]]).
  *
  * Bit-exactness matters: `embedding_neardups` is hash-checked against
  * the DuckDB oracle and the simhash/hyperplane band queries feed
  * deterministic recall gates, so each kernel reproduces the HOF
  * result exactly (same accumulation order, same `% 1000` remainder
  * semantics, same strict `> 0` sign test).
  */
object VectorKernels {
  private[functions] def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  private[functions] def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  /** Unit-normalized centroid matrix (zero-norm rows pass through) —
    * THE shared convention of every centroid kernel here. The HOF
    * differential oracles in [[graft.ops.Similarity]] deliberately
    * re-derive it so a drift in this helper cannot hide from the
    * differential specs. */
  private[functions] def unitRows(
      cs: Seq[(Long, Seq[Double])]): Array[Array[Double]] =
    cs.map { case (_, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      (if (n == 0) v else v.map(_ / n)).toArray
    }.toArray
}

/** dot(a, b) as one fused loop. Mirrors
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, acc + v)` exactly: left-to-right accumulation, null result on
  * length mismatch or a null element (a null product poisons the HOF
  * sum the same way). */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {
  import VectorKernels._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    DotF.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotR")
      s"""java.lang.Double $r = graft.functions.DotF.compute($a, $b,
         |  ${isFloat(left.dataType)}, ${isFloat(right.dataType)});
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_f"
}

object DotF {
  def compute(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    Shim.toColumn(DotF(Shim.toExpression(a), Shim.toExpression(b)))
}

/** `nBits` sign bits of pseudo-random hyperplane projections packed
  * into a long — the fused form of [[graft.ops.Similarity.hyperplaneSketch]]'s
  * HOF pipeline. Hyperplane component (bit, j) is
  * `(xxhash64(bit, j) % 1000) / 1000.0` with Spark's exact int-input
  * xxhash64 chain (`XXH64.hashInt(j, XXH64.hashInt(bit, 42))`), so
  * sketches are bit-identical to the declarative version. A null vector
  * element nullifies every projection, which packs to 0L — same as the
  * HOF's null-poisoned aggregate. */
case class VecSignBits(child: Expression, nBits: Int, seedOffset: Int)
    extends UnaryExpression {
  import VectorKernels._

  require(nBits >= 1 && nBits <= 64, s"nBits out of range: $nBits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sign_bits expects array<float|double>, got ${child.dataType}")
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    VecSignBits.compute(input.asInstanceOf[ArrayData],
      isFloat(child.dataType), nBits, seedOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecSignBits.compute($c, ${isFloat(child.dataType)}, $nBits, $seedOffset)")

  override protected def withNewChildInternal(newChild: Expression): VecSignBits =
    copy(child = newChild)
  override def prettyName: String = "vec_sign_bits"
}

object VecSignBits {
  def compute(v: ArrayData, isFloat: Boolean, nBits: Int, seedOffset: Int): Long = {
    val n = v.numElements()
    var i = 0
    while (i < n) { // null element -> every projection null -> 0L
      if (v.isNullAt(i)) return 0L
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < nBits) {
      val hseed = XXH64.hashInt(seedOffset + bit, 42L)
      var acc = 0.0
      var j = 0
      while (j < n) {
        val w = (XXH64.hashInt(j, hseed) % 1000L).toDouble / 1000.0
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += x * w
        j += 1
      }
      if (acc > 0) sig |= 1L << bit
      bit += 1
    }
    sig
  }

  def apply(c: Column, nBits: Int, seedOffset: Int): Column =
    Shim.toColumn(VecSignBits(Shim.toExpression(c), nBits, seedOffset))
}

/** 64-bit SimHash over a token array in one pass — the fused form of
  * [[graft.ops.Dedup.simhash]]'s per-bit HOF aggregate. Token hash is
  * Spark's exact `xxhash64(token)` (`XXH64.hashUTF8String(t, 42)`; a
  * null token leaves the seed, also matching `xxhash64`), bit b of the
  * result is `popcount-weighted sum > 0`, strict, like the HOF pack. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got $dt")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Number of positionally-equal lanes of two minhash signatures — the
  * fused form of `size(filter(zip_with(a, b, x === y), m => m))`. Null
  * lanes and (never-occurring) length-mismatch tails compare unequal,
  * exactly like the HOF (null `===` drops out of `filter`). */
case class LaneMatches(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lane_matches expects array<bigint> inputs, got $l / $r")
    }
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    LaneMatches.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LaneMatches.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LaneMatches =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "lane_matches"
}

object LaneMatches {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  def apply(a: Column, b: Column): Column =
    Shim.toColumn(LaneMatches(Shim.toExpression(a), Shim.toExpression(b)))
}

/** Exact Jaccard of two SORTED-DISTINCT long arrays (the [[ShingleHashes]]
  * output contract) via a single merge scan — the fused form of
  * `size(array_intersect(a, b)) / size(array_union(a, b))`, which builds
  * a hash set per pair. Both empty -> 0/0 = NaN, matching the double
  * division (NaN fails `>= threshold` filters the same way). */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_long_jaccard expects array<bigint> inputs, got $l / $r")
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedLongJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SortedLongJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongJaccard =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_long_jaccard"
}

object SortedLongJaccard {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter).toDouble
  }

  def apply(a: Column, b: Column): Column =
    Shim.toColumn(SortedLongJaccard(Shim.toExpression(a), Shim.toExpression(b)))
}

object SimHash64 {
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (tokens.isNullAt(i)) 42L // xxhash64(null) = seed
        else XXH64.hashUTF8String(tokens.get(i, StringType).asInstanceOf[UTF8String], 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  def apply(c: Column): Column = Shim.toColumn(SimHash64(Shim.toExpression(c)))
}

/** Nearest-centroid assignment as ONE codegen'd kernel: argmin over
  * the literal centroid table of the negated dot against the UNIT
  * centroid (the query vector deliberately NOT normalized — argmin is
  * norm-invariant), ties to the smallest centroid id. Bit-identical to
  * [[graft.ops.Similarity.assignNarrow]]'s
  * `array_min(centroidSims(...))` formulation on well-formed vectors:
  * same unit normalization (zero-norm centroids kept as-is), same
  * [[DotF]] left-to-right accumulation and operand order, same
  * (score asc, id asc) lexicographic tie rule — pinned differentially
  * by `VectorKernelsSpec`. The expression form evaluates an
  * interpreted per-element lambda per centroid (measured 0.36 µs per
  * row×centroid in the 100× rehearsal — minutes per corpus pass at
  * k in the hundreds, CPU-days at 10⁹×4096); this kernel is a tight
  * double loop over a closure-captured matrix, the same treatment
  * [[graft.ops.Similarity.lloydStep]]'s training pass already got.
  * A null vector, a null element, or a length differing from the
  * centroid dim nulls the row (the HOF form's behavior there rests on
  * null-struct ordering internals; the kernel makes it defined). */
case class AssignCellK(child: Expression, cents: Seq[(Long, Seq[Double])])
    extends UnaryExpression {
  import VectorKernels._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"assign_cell expects array<float|double>, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val unit: Array[Array[Double]] = cents.map { case (_, v) =>
    val n = math.sqrt(v.map(x => x * x).sum)
    (if (n == 0) v else v.map(_ / n)).toArray
  }.toArray
  @transient private lazy val ids: Array[Long] = cents.map(_._1).toArray

  override def nullSafeEval(input: Any): Any =
    AssignCellK.compute(input.asInstanceOf[ArrayData],
      isFloat(child.dataType), unit, ids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = ctx.addReferenceObj("assignUnit", unit, "double[][]")
    val cid = ctx.addReferenceObj("assignIds", ids, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("asgR")
      s"""java.lang.Long $r = graft.functions.AssignCellK.compute($v,
         |  ${isFloat(child.dataType)}, $u, $cid);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AssignCellK =
    copy(child = newChild)
  override def prettyName: String = "assign_cell"
}

object AssignCellK {
  def compute(v: ArrayData, vFloat: Boolean,
      unit: Array[Array[Double]], ids: Array[Long]): java.lang.Long = {
    val k = unit.length
    if (k == 0) return null
    val n = v.numElements()
    var bestScore = Double.NaN
    var bestId = 0L
    var first = true
    var c = 0
    while (c < k) {
      val u = unit(c)
      if (u.length != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * u(i)
        i += 1
      }
      val ns = -acc
      val id = ids(c)
      // Double.compare, not primitive <: Spark's struct-min ordering
      // puts NaN greatest and -0.0 below 0.0 — primitive comparisons
      // diverge on both (a NaN first entry would be unbeatable)
      val cmp = if (first) -1 else java.lang.Double.compare(ns, bestScore)
      if (cmp < 0 || (cmp == 0 && id < bestId)) {
        bestScore = ns; bestId = id; first = false
      }
      c += 1
    }
    bestId
  }

  def apply(vec: Column, cents: Seq[(Long, Seq[Double])]): Column =
    Shim.toColumn(AssignCellK(Shim.toExpression(vec), cents))
}

/** The `nprobe` nearest centroid ids, as one codegen'd kernel — the
  * selection form of [[AssignCellK]] and the kernel form of
  * [[graft.ops.Similarity.probeNarrow]]'s
  * `array_sort(centroidSims(...))` HOF (which evaluates an interpreted
  * lambda per centroid per row AND materializes + sorts the full
  * k-struct array just to keep nprobe — the k-scaling wall assignment
  * already hit, recurring on the probe side after re-splits grew k
  * into the hundreds). Identical ordering: score = negated dot against
  * the UNIT centroid (query not normalized), (score asc, id asc)
  * lexicographic with Double.compare semantics (NaN greatest,
  * -0.0 < 0.0) — the HOF's struct sort order. O(k × nprobe) insertion
  * selection per row, no allocation beyond the result. Null vector /
  * null element / dim mismatch nulls the row (defined where the HOF's
  * null-struct ordering was an internals accident). Differential-
  * pinned by `VectorKernelsSpec`. */
case class ProbeCellsK(child: Expression, cents: Seq[(Long, Seq[Double])],
    nprobe: Int) extends UnaryExpression {
  import VectorKernels._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"probe_cells expects array<float|double>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val unit: Array[Array[Double]] = cents.map { case (_, v) =>
    val n = math.sqrt(v.map(x => x * x).sum)
    (if (n == 0) v else v.map(_ / n)).toArray
  }.toArray
  @transient private lazy val ids: Array[Long] = cents.map(_._1).toArray

  override def nullSafeEval(input: Any): Any =
    ProbeCellsK.compute(input.asInstanceOf[ArrayData],
      isFloat(child.dataType), unit, ids, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u = ctx.addReferenceObj("probeUnit", unit, "double[][]")
    val cid = ctx.addReferenceObj("probeIds", ids, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("prbR")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.ProbeCellsK.compute($v,
         |    ${isFloat(child.dataType)}, $u, $cid, $nprobe);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeCellsK =
    copy(child = newChild)
  override def prettyName: String = "probe_cells"
}

object ProbeCellsK {
  def compute(v: ArrayData, vFloat: Boolean, unit: Array[Array[Double]],
      ids: Array[Long], nprobe: Int): ArrayData = {
    val k = unit.length
    val m = math.min(math.max(nprobe, 0), k)
    if (m == 0) return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.empty[Long])
    val n = v.numElements()
    val bestS = new Array[Double](m)
    val bestId = new Array[Long](m)
    var filled = 0
    var c = 0
    while (c < k) {
      val u = unit(c)
      if (u.length != n) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * u(i)
        i += 1
      }
      val ns = -acc
      val id = ids(c)
      // insertion selection under (Double.compare(ns) asc, id asc):
      // find the slot this entry belongs in among the current best
      if (filled < m || {
        val cmp = java.lang.Double.compare(ns, bestS(filled - 1))
        cmp < 0 || (cmp == 0 && id < bestId(filled - 1))
      }) {
        var pos = if (filled < m) filled else m - 1
        while (pos > 0 && {
          val cmp = java.lang.Double.compare(ns, bestS(pos - 1))
          cmp < 0 || (cmp == 0 && id < bestId(pos - 1))
        }) {
          bestS(pos) = bestS(pos - 1); bestId(pos) = bestId(pos - 1)
          pos -= 1
        }
        bestS(pos) = ns; bestId(pos) = id
        if (filled < m) filled += 1
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(bestId.take(filled))
  }

  def apply(vec: Column, cents: Seq[(Long, Seq[Double])], nprobe: Int): Column =
    Shim.toColumn(ProbeCellsK(Shim.toExpression(vec), cents, nprobe))
}

/** Hierarchical (two-level) nearest-centroid assignment as one
  * codegen'd kernel — the fused form of
  * [[graft.ops.Similarity.assignHierarchical]]: probe the `nprobe`
  * closest COARSE groups (same (score asc, id asc) Double.compare
  * order as [[ProbeCellsK]]), then exact argmin over only their
  * member FINE centroids (same tie rule as [[AssignCellK]]). The HOF
  * form evaluates an interpreted dot lambda per fine candidate per
  * row (~nprobe x k/m candidates — hundreds at SemDeDup scales), plus
  * a full m-struct sort; this is two tight loops. Coarse ids are
  * dense 0..m-1 (the [[graft.ops.Similarity.trainCoarse]] contract),
  * indexing `members` directly; member entries are 0-based fine
  * POSITIONS (== fine ids, dense from training). Null vector / null
  * element / dim mismatch nulls the row. Differential-pinned by
  * `VectorKernelsSpec`; flat-vs-hier agreement stays pinned by the
  * `hier_assign_gate` oracle end-to-end. */
case class HierAssignK(child: Expression, fine: Seq[(Long, Seq[Double])],
    coarse: Seq[(Long, Seq[Double])], members: Seq[Seq[Int]], nprobe: Int)
    extends UnaryExpression {
  import VectorKernels._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hier_assign expects array<float|double>, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val fineUnit: Array[Array[Double]] =
    VectorKernels.unitRows(fine)
  @transient private lazy val fineIds: Array[Long] = fine.map(_._1).toArray
  @transient private lazy val coarseUnit: Array[Array[Double]] =
    VectorKernels.unitRows(coarse)
  @transient private lazy val coarseIds: Array[Long] = coarse.map(_._1).toArray
  @transient private lazy val memberTab: Array[Array[Int]] =
    members.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    HierAssignK.compute(input.asInstanceOf[ArrayData], isFloat(child.dataType),
      fineUnit, fineIds, coarseUnit, coarseIds, memberTab, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fu = ctx.addReferenceObj("hierFineUnit", fineUnit, "double[][]")
    val fi = ctx.addReferenceObj("hierFineIds", fineIds, "long[]")
    val cu = ctx.addReferenceObj("hierCoarseUnit", coarseUnit, "double[][]")
    val ci = ctx.addReferenceObj("hierCoarseIds", coarseIds, "long[]")
    val mt = ctx.addReferenceObj("hierMembers", memberTab, "int[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("hierR")
      s"""java.lang.Long $r = graft.functions.HierAssignK.compute($v,
         |  ${isFloat(child.dataType)}, $fu, $fi, $cu, $ci, $mt, $nprobe);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HierAssignK =
    copy(child = newChild)
  override def prettyName: String = "hier_assign"
}

object HierAssignK {
  def compute(v: ArrayData, vFloat: Boolean,
      fineUnit: Array[Array[Double]], fineIds: Array[Long],
      coarseUnit: Array[Array[Double]], coarseIds: Array[Long],
      members: Array[Array[Int]], nprobe: Int): java.lang.Long = {
    val probed = ProbeCellsK.compute(v, vFloat, coarseUnit, coarseIds, nprobe)
    if (probed == null) return null
    val n = v.numElements()
    var bestScore = Double.NaN
    var bestId = 0L
    var first = true
    var g = 0
    val np = probed.numElements()
    while (g < np) {
      val ms = members(probed.getLong(g).toInt)
      var j = 0
      while (j < ms.length) {
        val u = fineUnit(ms(j))
        if (u.length != n) return null
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (v.isNullAt(i)) return null
          val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
          acc += x * u(i)
          i += 1
        }
        val ns = -acc
        val id = fineIds(ms(j))
        val cmp = if (first) -1 else java.lang.Double.compare(ns, bestScore)
        if (cmp < 0 || (cmp == 0 && id < bestId)) {
          bestScore = ns; bestId = id; first = false
        }
        j += 1
      }
      g += 1
    }
    if (first) null else bestId
  }

  def apply(vec: Column, fine: Seq[(Long, Seq[Double])],
      coarse: Seq[(Long, Seq[Double])], members: Seq[Seq[Int]],
      nprobe: Int): Column =
    Shim.toColumn(HierAssignK(Shim.toExpression(vec), fine, coarse, members, nprobe))
}

/** Hierarchical (two-level) cell PROBE as one codegen'd kernel — the
  * top-`nfine` selection form of [[HierAssignK]], and the two-level
  * analogue of [[ProbeCellsK]]: probe the `nprobeCoarse` closest
  * COARSE groups (same (score asc, id asc) Double.compare order),
  * then insertion-select the `nfine` nearest FINE centroids among
  * only their members. This is what makes a persisted IVF index
  * probe-able past the flat cell cap: per-row cost is
  * O(m × nprobeCoarse + (k/m) × nprobeCoarse × nfine) dots instead of
  * O(k) — at k = 100k cells, m = √k, that is hundreds of dots, not
  * 10⁵. With nprobeCoarse = m it degenerates to exactly
  * [[ProbeCellsK]] over the fine table (pinned differentially).
  * Coarse ids are dense 0..m-1 ([[graft.ops.Similarity.trainCoarse]]
  * contract); member entries are 0-based fine POSITIONS. Null vector /
  * null element / dim mismatch nulls the row. */
case class HierProbeK(child: Expression, fine: Seq[(Long, Seq[Double])],
    coarse: Seq[(Long, Seq[Double])], members: Seq[Seq[Int]],
    nprobeCoarse: Int, nfine: Int) extends UnaryExpression {
  import VectorKernels._

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hier_probe expects array<float|double>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val fineUnit: Array[Array[Double]] =
    VectorKernels.unitRows(fine)
  @transient private lazy val fineIds: Array[Long] = fine.map(_._1).toArray
  @transient private lazy val coarseUnit: Array[Array[Double]] =
    VectorKernels.unitRows(coarse)
  @transient private lazy val coarseIds: Array[Long] = coarse.map(_._1).toArray
  @transient private lazy val memberTab: Array[Array[Int]] =
    members.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    HierProbeK.compute(input.asInstanceOf[ArrayData], isFloat(child.dataType),
      fineUnit, fineIds, coarseUnit, coarseIds, memberTab, nprobeCoarse, nfine)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fu = ctx.addReferenceObj("hprFineUnit", fineUnit, "double[][]")
    val fi = ctx.addReferenceObj("hprFineIds", fineIds, "long[]")
    val cu = ctx.addReferenceObj("hprCoarseUnit", coarseUnit, "double[][]")
    val ci = ctx.addReferenceObj("hprCoarseIds", coarseIds, "long[]")
    val mt = ctx.addReferenceObj("hprMembers", memberTab, "int[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("hprR")
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.HierProbeK.compute($v,
         |    ${isFloat(child.dataType)}, $fu, $fi, $cu, $ci, $mt,
         |    $nprobeCoarse, $nfine);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HierProbeK =
    copy(child = newChild)
  override def prettyName: String = "hier_probe"
}

object HierProbeK {
  def compute(v: ArrayData, vFloat: Boolean,
      fineUnit: Array[Array[Double]], fineIds: Array[Long],
      coarseUnit: Array[Array[Double]], coarseIds: Array[Long],
      members: Array[Array[Int]], nprobeCoarse: Int, nfine: Int): ArrayData = {
    val probed = ProbeCellsK.compute(v, vFloat, coarseUnit, coarseIds, nprobeCoarse)
    if (probed == null) return null
    val n = v.numElements()
    // candidate count = sum of probed groups' member sizes
    var cand = 0
    var g = 0
    val np = probed.numElements()
    while (g < np) { cand += members(probed.getLong(g).toInt).length; g += 1 }
    val m = math.min(math.max(nfine, 0), cand)
    if (m == 0) return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.empty[Long])
    val bestS = new Array[Double](m)
    val bestId = new Array[Long](m)
    var filled = 0
    g = 0
    while (g < np) {
      val ms = members(probed.getLong(g).toInt)
      var j = 0
      while (j < ms.length) {
        val u = fineUnit(ms(j))
        if (u.length != n) return null
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (v.isNullAt(i)) return null
          val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
          acc += x * u(i)
          i += 1
        }
        val ns = -acc
        val id = fineIds(ms(j))
        // insertion selection under (Double.compare(ns) asc, id asc) —
        // identical to ProbeCellsK so degenerate cases agree exactly
        if (filled < m || {
          val cmp = java.lang.Double.compare(ns, bestS(filled - 1))
          cmp < 0 || (cmp == 0 && id < bestId(filled - 1))
        }) {
          var pos = if (filled < m) filled else m - 1
          while (pos > 0 && {
            val cmp = java.lang.Double.compare(ns, bestS(pos - 1))
            cmp < 0 || (cmp == 0 && id < bestId(pos - 1))
          }) {
            bestS(pos) = bestS(pos - 1); bestId(pos) = bestId(pos - 1)
            pos -= 1
          }
          bestS(pos) = ns; bestId(pos) = id
          if (filled < m) filled += 1
        }
        j += 1
      }
      g += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(bestId.take(filled))
  }

  def apply(vec: Column, fine: Seq[(Long, Seq[Double])],
      coarse: Seq[(Long, Seq[Double])], members: Seq[Seq[Int]],
      nprobeCoarse: Int, nfine: Int): Column =
    Shim.toColumn(HierProbeK(Shim.toExpression(vec), fine, coarse, members,
      nprobeCoarse, nfine))
}
