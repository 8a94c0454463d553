package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{CellIndex, StablePoint}

/**
 * `CellEncode(lon, lat, res)` — the batched cell-encoding stage of the
 * north star: a native Catalyst scalar expression with full codegen
 * (`doGenCode` emits a static call into [[graft.core.CellIndex]]), so the
 * encode runs inside WholeStageCodegen with zero boxing/serialization —
 * the Spark-native replacement for the reference's per-block
 * `rasterio.transform.rowcol` arithmetic (reference raster.py:2351).
 */
case class CellEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == DoubleType && second.dataType == DoubleType &&
      third.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cell_encode expects (double, double, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override def nullSafeEval(lon: Any, lat: Any, res: Any): Any =
    CellIndex.encode(lon.asInstanceOf[Double], lat.asInstanceOf[Double], res.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat, res) => s"graft.core.CellIndex.encode($lon, $lat, $res)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `CellParentAt(cell, res)` — ancestor cell at a coarser resolution; codegen'd. */
case class CellParentAt(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(cell: Any, res: Any): Any =
    CellIndex.parentAt(cell.asInstanceOf[Long], res.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (cell, res) => s"graft.core.CellIndex.parentAt($cell, $res)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/**
 * `CellDisk(cell, k)` — array of all cells within Chebyshev distance k
 * (the (2k+1)^2 neighbor block, lon-wrapped). Used with `explode` for
 * the stage-1 candidate expansion of the kNN join (SURVEY.md §2.3) —
 * that runs once per PROBE (billions at scale), so the expression is
 * codegen'd: the generated code calls the static kernel and wraps the
 * long[] once, keeping the probe projection inside WholeStageCodegen.
 */
case class CellDisk(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(cell: Any, k: Any): Any =
    new GenericArrayData(CellIndex.gridDisk(cell.asInstanceOf[Long], k.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (cell, kk) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.core.CellIndex.gridDisk($cell, $kk))")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** `UrlLon(url)` / `UrlLat(url)` — page-derived point geometry from a stable url hash. */
case class UrlLon(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(url: Any): Any =
    StablePoint.lonFromUrl(url.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, url => s"graft.core.StablePoint.lonFromUrl($url)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/**
 * `TextFingerprint(text)` — rolling polynomial document fingerprint over
 * UTF-8 bytes (see [[graft.core.TextHash.fingerprint]]). Native codegen'd
 * expression: one linear byte scan per document, replacing the O(len^2)
 * `aggregate(transform(sequence(1, length(t)), i -> ascii(substring(t, i,
 * 1))), ...)` SQL formulation (each substring re-seeks the UTF-8 string).
 */
case class TextFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(t: Any): Any =
    graft.core.TextHash.fingerprint(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.core.TextHash.fingerprint($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

case class UrlLat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(url: Any): Any =
    StablePoint.latFromUrl(url.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, url => s"graft.core.StablePoint.latFromUrl($url)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
