package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.ops.TextOps

/** Native Catalyst expressions for the LSH signature kernels of the
  * dedup/similarity family (SURVEY.md §2 N2/N3).
  *
  * Why expressions and not higher-order functions: `transform` /
  * `aggregate` / `zip_with` are `CodegenFallback` — every lambda step
  * is an interpreted Catalyst eval, so a 128-perm MinHash over a
  * 200-element set costs ~25k interpreted node evaluations per row.
  * These expressions run the same arithmetic as one tight JVM loop per
  * row (and stay inside whole-stage codegen via a generated call to
  * [[MinHashBands.compute]] / [[HyperplaneBands.compute]]), which is
  * 50-100× faster and exactly the discipline a 100 TB scan needs.
  *
  * Both are deterministic pure functions of their input array — no RNG
  * state is shipped to executors; constants derive from fixed seeds
  * (TextOps.affineConstants / splitmix64).
  */
object SigKernels {
  /** splitmix64 finalizer — the standard 64-bit avalanche mixer. */
  def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** ±1 hyperplane weight matrix for (nBits, dim), flattened row-major;
    * cached because it is a pure function of its shape.
    */
  private val weightCache = new ConcurrentHashMap[(Int, Int), Array[Long]]()
  def hyperplaneWeights(nBits: Int, dim: Int): Array[Long] =
    weightCache.computeIfAbsent((nBits, dim), { case (b, d) =>
      val w = new Array[Long](b * d)
      var i = 0
      while (i < w.length) {
        w(i) = if ((splitmix64((i / d).toLong << 32 | (i % d)) & 1L) == 0L) 1L
               else -1L
        i += 1
      }
      w
    })
}

/** MinHash band signatures: input = array<bigint> of per-element
  * 64-bit hashes (any sign — reduced into [0, P) internally); output =
  * array<bigint> of `bands` band hashes, where band hash b folds the
  * `numPerms/bands` minhashes of that band. Two sets land in the same
  * (band, hash) bucket iff their minhash rows agree on that band
  * (modulo 64-bit fold collisions, which only add false positives —
  * candidates are always verified exactly downstream).
  *
  * Minhash i = min over elements h of (a_i·h + b_i) mod P, with
  * (a_i, b_i) = TextOps.affineConstants(42, numPerms) — a fixed
  * affine-permutation family (reference for the banding scheme:
  * Broder's minwise hashing + LSH banding as surveyed in PAPERS.md).
  */
case class MinHashBands(child: Expression, numPerms: Int, bands: Int)
    extends UnaryExpression {
  require(numPerms % bands == 0, "numPerms must be a multiple of bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  private val ab = TextOps.affineConstants(42L, numPerms)
  private val as: Array[Long] = ab.map(_._1).toArray
  private val bs: Array[Long] = ab.map(_._2).toArray

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val perms = numPerms
    val mh = new Array[Long](perms)
    java.util.Arrays.fill(mh, Long.MaxValue)
    val P = TextOps.P
    var j = 0
    while (j < n) {
      val h = (arr.getLong(j) & Long.MaxValue) % P
      var i = 0
      while (i < perms) {
        // a < P < 2^31 and h < P, so a*h + b < 2^62: no overflow.
        // Mersenne fold replaces the 64-bit `%` (the hot-loop cost at
        // elements x perms evaluations): for P = 2^31 - 1 and
        // x < 2^62, two shift-folds + one conditional subtract give
        // exactly x mod P — bit-identical results, several times
        // cheaper than hardware division.
        val x = as(i) * h + bs(i)
        val y = (x & P) + (x >>> 31)
        val z = (y & P) + (y >>> 31)
        val v = if (z >= P) z - P else z
        if (v < mh(i)) mh(i) = v
        i += 1
      }
      j += 1
    }
    val rows = perms / bands
    val out = new Array[Long](bands)
    var bi = 0
    while (bi < bands) {
      var acc = 1125899906842597L
      var r = 0
      while (r < rows) { acc = acc * 1000003L + mh(bi * rows + r); r += 1 }
      out(bi) = acc
      bi += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashBands", this,
      classOf[MinHashBands].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashBands = copy(child = newChild)
}

/** Random-hyperplane LSH band signatures: input = array<bigint>
  * (milli-quantized vector, Dedup.quantize); output = array<bigint> of
  * `bands` band hashes, each packing `rowsPerBand` sign bits of the
  * vector's projection onto fixed ±1 hyperplanes
  * (SigKernels.hyperplaneWeights). P[bit agrees] = 1 − θ/π for a pair
  * at angle θ (Charikar's SimHash rounding scheme — see PAPERS.md).
  */
case class HyperplaneBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_bands"

  def compute(arr: ArrayData): ArrayData = {
    val dim = arr.numElements()
    val nBits = bands * rowsPerBand
    val w = SigKernels.hyperplaneWeights(nBits, dim)
    val v = new Array[Long](dim)
    var i = 0
    while (i < dim) { v(i) = arr.getLong(i); i += 1 }
    val out = new Array[Long](bands)
    var bit = 0
    var bi = 0
    while (bi < bands) {
      var acc = 0L
      var r = 0
      while (r < rowsPerBand) {
        var dot = 0L
        val base = bit * dim
        var d = 0
        while (d < dim) { dot += v(d) * w(base + d); d += 1 }
        acc = (acc << 1) | (if (dot >= 0) 1L else 0L)
        bit += 1
        r += 1
      }
      out(bi) = acc
      bi += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneBands", this,
      classOf[HyperplaneBands].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneBands = copy(child = newChild)
}
