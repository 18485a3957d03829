package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct 64-bit rolling hashes of all
  * k-byte shingles of a string, in ONE pass over its UTF-8 bytes.
  *
  * This replaces `transform(sequence(...), i -> substr(...))` +
  * `xxhash64` chains, which are O(len*k) with heavy allocation (each
  * shingle materialized as a UTF8String) — the profiled bottleneck of
  * MinHash dedup. Here: a Rabin-Karp polynomial over bytes with a
  * murmur3-style finalizer for avalanche, sort + dedup in a primitive
  * long[], zero per-shingle allocation.
  *
  * Codegen emits a single static call (standard Spark practice for
  * loop-heavy kernels), so the expression stays inside whole-stage
  * codegen without boxing.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1 && k <= 64, s"shingle width out of range: $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  private final val PRIME = 0x100000001b3L // FNV-ish multiplier

  /** murmur3 fmix64 finalizer: avalanche the polynomial value so LSH
    * band-slices of the hash are well distributed. */
  private def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** One pass, no per-shingle allocation; returns sorted distinct
    * hashes (set semantics — callers use them for min/intersect). */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n <= k) return new GenericArrayData(Array(fmix64(polyAll(bytes))))
    // pow = PRIME^(k-1) for removing the outgoing byte
    var pow = 1L
    var i = 1
    while (i < k) { pow *= PRIME; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < n) {
      if (i >= k) h -= (bytes(i - k) & 0xFFL) * pow
      h = h * PRIME + (bytes(i) & 0xFFL)
      if (i >= k - 1) out(i - k + 1) = fmix64(h)
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  private def polyAll(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * PRIME + (bytes(i) & 0xFFL); i += 1 }
    h
  }

  def apply(c: Column, k: Int): Column =
    Shim.toColumn(ShingleHashes(Shim.toExpression(c), k))
}
