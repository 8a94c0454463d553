package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native loop kernels for the embedding (`array<float>`) operators.
 *
 * The round-3 formulations unrolled `dim x planes` (and `dim x
 * centroids`) multiply-adds into one giant Column tree: at dim=64 the
 * generated projection method crossed janino's limits
 * (`InternalCompilerException`, ~14,000 generated lines) and the whole
 * stage silently fell back to INTERPRETED evaluation — at production
 * embedding dims (768–4096) the fallback is guaranteed. These kernels
 * LOOP over the array against a plane/centroid matrix that ships with
 * the plan as a codegen reference object (the [[graft.operators.PipWinner]]
 * pattern), so the generated code is a constant-size static call and the
 * stage stays inside WholeStageCodegen at any dimension.
 *
 * Bit-exactness contract (the DuckDB oracle twins replay these): every
 * loop accumulates LEFT-TO-RIGHT in the same order as the SQL text —
 * each float is widened to double first, each product is formed before
 * the add — so results are IEEE-identical to the unrolled formulation.
 */
object VecKernels {

  /** Sequential-fold dot product (floats widened to double, index order). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var d = 0
    while (d < n) {
      acc += a.getFloat(d).toDouble * b.getFloat(d).toDouble
      d += 1
    }
    acc
  }

  /** Sign bits of <v, plane_p> packed little-endian (bit p = plane row p). */
  def lshBucket(v: ArrayData, planes: Array[Array[Double]]): Int = {
    val n = v.numElements()
    var bucket = 0
    var p = 0
    while (p < planes.length) {
      val row = planes(p)
      val dim = math.min(n, row.length)
      var s = 0.0
      var d = 0
      while (d < dim) {
        s += v.getFloat(d).toDouble * row(d)
        d += 1
      }
      if (s >= 0.0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  /**
   * Per-centroid scores  c2_c - sum_d mul2_c(d) * v(d)  (squared L2
   * minus the per-row ||v||^2 constant, preserving the argmin), where
   * `mul2_c(d) = 2 * centroid_c(d)` and `c2_c = ||centroid_c||^2` are
   * precomputed at plan construction.
   */
  def centroidScores(v: ArrayData, mul2: Array[Array[Double]],
                     c2: Array[Double]): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](mul2.length)
    var c = 0
    while (c < mul2.length) {
      val row = mul2(c)
      val dim = math.min(n, row.length)
      var acc = c2(c)
      var d = 0
      while (d < dim) {
        acc -= row(d) * v.getFloat(d).toDouble
        d += 1
      }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** Ray-cast kernels for the table-driven PIP refine (called from
  * generated code; same crossing formula as `core.Polygon.ringContains`
  * and the recalled Column fold — IEEE ops in identical order). */
object GeoKernels {

  /** Even-odd ray cast over one ring (parallel coordinate arrays). */
  def ringContains(px: Double, py: Double, xs: ArrayData, ys: ArrayData): Boolean = {
    val n = math.min(xs.numElements(), ys.numElements())
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = xs.getDouble(i); val yi = ys.getDouble(i)
      val xj = xs.getDouble(j); val yj = ys.getDouble(j)
      if (((yi > py) != (yj > py)) && px < (xj - xi) * (py - yi) / (yj - yi) + xi)
        inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Even-odd across ALL rings (XOR): holes subtract, disjoint shells union. */
  def ringsContain(px: Double, py: Double, xss: ArrayData, yss: ArrayData): Boolean = {
    val n = math.min(xss.numElements(), yss.numElements())
    var inside = false
    var r = 0
    while (r < n) {
      if (ringContains(px, py, xss.getArray(r), yss.getArray(r))) inside = !inside
      r += 1
    }
    inside
  }
}

/**
 * `RingsContain(px, py, xss, yss)` — codegen'd even-odd containment of
 * a point in a multi-ring polygon: the refine predicate of
 * [[graft.operators.SpatialJoin.pipJoinTableRings]], evaluated once per
 * candidate (point, polygon) pair — as a native loop it stays inside
 * WholeStageCodegen (the previous `aggregate` fold was CodegenFallback,
 * interpreted per pair).
 */
case class RingsContain(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rings_contain"

  override def nullSafeEval(px: Any, py: Any, xss: Any, yss: Any): Any =
    GeoKernels.ringsContain(px.asInstanceOf[Double], py.asInstanceOf[Double],
      xss.asInstanceOf[ArrayData], yss.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (px, py, xss, yss) =>
      s"graft.functions.GeoKernels.ringsContain($px, $py, $xss, $yss)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(f, s, t, q)
}

/** `VecDot(a, b)` — codegen'd sequential-fold dot product of two array<float>. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/**
 * `LshBucket(vec)` — random-hyperplane signature of `vec` against the
 * plane matrix (one int, bit p = sign of <v, plane_p>). The matrix is a
 * plan-shipped reference object, so the generated code is one static
 * call at any (dim, planes) size.
 */
case class LshBucket(child: Expression, planes: Seq[Seq[Double]]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bucket"

  @transient private lazy val mat: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    VecKernels.lshBucket(v.asInstanceOf[ArrayData], mat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", mat, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VecKernels.lshBucket($v, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * `MinHashSig(text)` — one-pass MinHash signature over word w-shingles
 * (see [[graft.core.TextHash.minhashSig]] for the exact semantics and
 * the in-place shingle-span trick). Replaces the Column tower
 * `transform(shingles(text)) -> md5 -> conv -> 16 x array_min`, whose
 * higher-order functions are CodegenFallback AND materialize the
 * shingle array per document. Null for texts with fewer than w words.
 */
case class MinHashSig(child: Expression, w: Int,
                      as: Seq[Long], bs: Seq[Long]) extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "hash param arrays must match")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // < w words -> null signature
  override def prettyName: String = "minhash_sig"

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def nullSafeEval(t: Any): Any = {
    val sig = graft.core.TextHash.minhashSig(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w, aArr, bArr)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refA = ctx.addReferenceObj("mhA", aArr, "long[]")
    val refB = ctx.addReferenceObj("mhB", bArr, "long[]")
    val sig = ctx.freshName("mhSig")
    nullSafeCodeGen(ctx, ev, t => {
      s"""long[] $sig = graft.core.TextHash.minhashSig($t, $w, $refA, $refB);
         |if ($sig == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}""".stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * `ShingleIds(text)` — sorted distinct 60-bit shingle ids (see
 * [[graft.core.TextHash.shingleIds]]): the set the n-gram Jaccard
 * verify intersects, carried as `array<long>` instead of the shingle
 * string array. Codegen'd single pass; empty array under w words.
 */
case class ShingleIds(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_ids"

  override def nullSafeEval(t: Any): Any =
    new GenericArrayData(graft.core.TextHash.shingleIds(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.TextHash.shingleIds($t, $w))")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * `RepetitionStats(text)` — Gopher-style repetition signals as ONE
 * codegen'd byte scan per document (no token explode, no shuffle):
 * `[n_words, n_distinct_words, max_word_count, n_bigrams,
 *   n_distinct_bigrams, max_bigram_count]`
 * (see [[graft.core.TextHash.repetitionStats]]). The explode+groupBy
 * alternative shuffles every token of the corpus; this keeps the
 * quality gate a pure projection — the shape that survives 100 TB.
 */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(t: Any): Any =
    new GenericArrayData(graft.core.TextHash.repetitionStats(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.TextHash.repetitionStats($t))")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * `CentroidScores(vec)` — array of per-centroid squared-L2 scores
 * (minus the per-row constant; argmin = nearest centroid). `mul2`/`c2`
 * are derived once from the centroid matrix at construction and ship as
 * reference objects.
 */
case class CentroidScores(child: Expression, cents: Seq[Seq[Double]]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_scores"

  @transient private lazy val mul2: Array[Array[Double]] =
    cents.map(_.map(2.0 * _).toArray).toArray
  @transient private lazy val c2: Array[Double] =
    cents.map(_.foldLeft(0.0)((a, x) => a + x * x)).toArray

  override def nullSafeEval(v: Any): Any =
    VecKernels.centroidScores(v.asInstanceOf[ArrayData], mul2, c2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refM = ctx.addReferenceObj("mul2", mul2, "double[][]")
    val refC = ctx.addReferenceObj("c2", c2, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.VecKernels.centroidScores($v, $refM, $refC)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
