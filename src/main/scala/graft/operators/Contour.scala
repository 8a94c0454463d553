package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Utm.Ar

/**
 * Marching-squares contour extraction (gdal_contour analogue): for one
 * iso `level`, each 2×2 cell of the dense pixel grid emits 0, 1 or 2
 * line segments of the level set, with endpoints linearly interpolated
 * along the crossed cell edges — the raster→vector bridge of the
 * terrain family (the reference reaches isolines through GDAL; here
 * they are a first-class operator).
 *
 * Scale design: the 2×2 corner gather is TWO window shuffles (E
 * neighbor along the row pass; S and SE by lagging the row pass's
 * columns one row in the col pass — the [[Focal.d8]] plumbing), and
 * everything after is a pure projection: case index, gated
 * interpolation parameters as NAMED columns, a 14-way CASE per segment
 * coordinate, one `explode` over the ≤2-element segment array (nulls
 * filtered — never a union that would re-evaluate the window subtree
 * per slot).
 *
 * Exactness: corner values are integral; each interpolation parameter
 * is ONE shared-[[Ar]] chain `(level − za) / (zb − za)` evaluated only
 * when the edge is actually crossed (the gate also keeps the oracle
 * off DuckDB's x/0.0 = NULL vs Spark's ±Inf divergence), and endpoint
 * coordinates add it to an exact integer cast — identical IEEE op
 * order in both engines, raw doubles ship unquantized.
 *
 * Saddle cases (5, 10) disambiguate by the center average — the
 * standard rule, decided on the exact LONG corner sum (`z1+z2+z3+z4 ≥
 * 4·level` as one double compare, no division).
 *
 * Segment endpoints are in GRID coordinates (x along `col`, y along
 * `row`); callers compose [[graft.functions.cellXY]]-style affine
 * transforms for world coordinates. Cells with any nodata corner emit
 * nothing (conservative gdal-style border contract).
 */
object Contour {

  /** Edge ids: 0 = top (TL→TR), 1 = right (TR→BR), 2 = bottom (BL→BR),
    * 3 = left (TL→BL) — each with a FIXED interpolation direction. */
  private type Seg = (Int, Int)

  /** bits (TL=8, TR=4, BR=2, BL=1; inside = z ≥ level) →
    * (segments when center ≥ level, segments otherwise). Only the two
    * saddles differ between the variants. */
  val Segs: Seq[(Int, (Seq[Seg], Seq[Seg]))] = Seq(
    1 -> (Seq((3, 2)), Seq((3, 2))),
    2 -> (Seq((2, 1)), Seq((2, 1))),
    3 -> (Seq((3, 1)), Seq((3, 1))),
    4 -> (Seq((0, 1)), Seq((0, 1))),
    5 -> (Seq((0, 3), (1, 2)), Seq((0, 1), (3, 2))),
    6 -> (Seq((0, 2)), Seq((0, 2))),
    7 -> (Seq((3, 0)), Seq((3, 0))),
    8 -> (Seq((3, 0)), Seq((3, 0))),
    9 -> (Seq((0, 2)), Seq((0, 2))),
    10 -> (Seq((0, 1), (3, 2)), Seq((3, 0), (1, 2))),
    11 -> (Seq((0, 1)), Seq((0, 1))),
    12 -> (Seq((3, 1)), Seq((3, 1))),
    13 -> (Seq((1, 2)), Seq((1, 2))),
    14 -> (Seq((3, 2)), Seq((3, 2))))

  /** Interpolation parameter t = (level − za)/(zb − za) over [[Ar]]
    * (za/zb already cast to the Ar domain). */
  def interp[X](level: Double, za: X, zb: X)(implicit F: Ar[X]): X =
    F.div(F.sub(F.lit(level), za), F.sub(zb, za))

  /** Endpoint (x, y) of edge `e` in grid coords over [[Ar]]: `r`/`c`
    * are the cell's row/col as Ar values, `t(e)` its interpolation. */
  def endpoint[X](e: Int, r: X, c: X, t: Int => X)(implicit F: Ar[X]): (X, X) =
    e match {
      case 0 => (F.add(c, t(0)), r)
      case 1 => (F.add(c, F.lit(1.0)), F.add(r, t(1)))
      case 2 => (F.add(c, t(2)), F.add(r, F.lit(1.0)))
      case 3 => (c, F.add(r, t(3)))
    }

  /** One iso level over a dense `(row, col, b)` grid → `(row, col,
    * seg, ax, ay, bx, by)` segments. */
  def segments(px: DataFrame, b: String, level: Double): DataFrame = {
    val hOrd = Window.partitionBy("row").orderBy("col")
    val vOrd = Window.partitionBy("col").orderBy("row")
    // corners: z1 = (r,c), z2 = (r,c+1), z4 = (r+1,c), z3 = (r+1,c+1)
    val g0 = px
      .withColumn("_z2", lead(col(b), 1).over(hOrd))
      .withColumn("_z4", lead(col(b), 1).over(vOrd))
      .withColumn("_z3", lead(col("_z2"), 1).over(vOrd))
      .where(col(b).isNotNull && col("_z2").isNotNull &&
        col("_z3").isNotNull && col("_z4").isNotNull)
    def in(z: Column): Column = z >= lit(level)
    val corners = Seq(col(b), col("_z2"), col("_z3"), col("_z4"))
    val bits = (in(col(b)).cast("int") * 8 + in(col("_z2")).cast("int") * 4 +
      in(col("_z3")).cast("int") * 2 + in(col("_z4")).cast("int"))
    // center rule on the exact LONG corner sum (one double compare)
    val cin = corners.map(_.cast("long")).reduce(_ + _).cast("double") >=
      lit(4.0 * level)
    // gated interpolation params, NAMED so the per-coordinate CASE
    // chains stay linear; edge -> (from, to) corner in fixed direction
    val edgeCorners = Seq(0 -> (b, "_z2"), 1 -> ("_z2", "_z3"),
      2 -> ("_z4", "_z3"), 3 -> (b, "_z4"))
    val g1 = edgeCorners.foldLeft(
        g0.withColumn("_bits", bits).withColumn("_cin", cin)) {
      case (d, (e, (za, zb))) =>
        d.withColumn(s"_t$e", when(in(col(za)) =!= in(col(zb)),
          interp[Column](level, col(za).cast("double"),
            col(zb).cast("double"))(Utm.ColAr)))
    }
    val rD = col("row").cast("double")
    val cD = col("col").cast("double")
    def t(e: Int): Column = col(s"_t$e")
    // per-slot segment struct via the table (14-way CASE; saddles
    // branch on _cin) — null when the case emits no such slot
    def slotStruct(slot: Int): Column =
      Segs.foldLeft(lit(null).cast(
        "struct<seg:int,ax:double,ay:double,bx:double,by:double>")) {
        case (acc, (bs, (inSegs, outSegs))) =>
          def mk(ss: Seq[Seg]): Column = ss.lift(slot) match {
            case None => lit(null).cast(
              "struct<seg:int,ax:double,ay:double,bx:double,by:double>")
            case Some((ea, eb)) =>
              val (ax, ay) = endpoint[Column](ea, rD, cD, t)(Utm.ColAr)
              val (bx, by) = endpoint[Column](eb, rD, cD, t)(Utm.ColAr)
              struct(lit(slot).as("seg"), ax.as("ax"), ay.as("ay"),
                bx.as("bx"), by.as("by"))
          }
          when(col("_bits") === bs,
            if (inSegs == outSegs) mk(inSegs)
            else when(col("_cin"), mk(inSegs)).otherwise(mk(outSegs)))
            .otherwise(acc)
      }
    g1.select(col("row"), col("col"),
        explode(array(slotStruct(0), slotStruct(1))).as("s"))
      .where(col("s").isNotNull)
      .select(col("row"), col("col"), col("s.seg").cast("long").as("seg"),
        col("s.ax").as("ax"), col("s.ay").as("ay"),
        col("s.bx").as("bx"), col("s.by").as("by"))
  }

  /** SQL twin of [[segments]] over a `(row, col, b1)` pixel relation
    * text — the identical table, gates and shared-[[Ar]] interpolation
    * chains, with the two slots as a UNION ALL over the (tiny)
    * projected CTE rather than an explode. */
  def segmentsSql(pxRel: String, b: String, level: Double): String = {
    import Utm.SqlAr
    val lvl = graft.sources.OracleLit.d(level)
    def in(z: String) = s"($z >= $lvl)"
    val bits = s"(CAST(${in(b)} AS INT) * 8 + CAST(${in("z2")} AS INT) * 4 + " +
      s"CAST(${in("z3")} AS INT) * 2 + CAST(${in("z4")} AS INT))"
    val cin = s"(CAST(CAST($b AS BIGINT) + CAST(z2 AS BIGINT) + " +
      s"CAST(z3 AS BIGINT) + CAST(z4 AS BIGINT) AS DOUBLE) >= " +
      graft.sources.OracleLit.d(4.0 * level) + ")"
    val edgeCorners = Seq(0 -> (b, "z2"), 1 -> ("z2", "z3"),
      2 -> ("z4", "z3"), 3 -> (b, "z4"))
    val tCols = edgeCorners.map { case (e, (za, zb)) =>
      s"(CASE WHEN ${in(za)} <> ${in(zb)} THEN " +
        interp[String](level, s"CAST($za AS DOUBLE)",
          s"CAST($zb AS DOUBLE)")(SqlAr) + s" END) AS t$e"
    }.mkString(",\n|        ")
    def t(e: Int): String = s"t$e"
    def coordCase(slot: Int, coord: Int): String =
      Segs.foldLeft("CAST(NULL AS DOUBLE)") {
        case (acc, (bs, (inSegs, outSegs))) =>
          def mk(ss: Seq[Seg]): String = ss.lift(slot) match {
            case None => "CAST(NULL AS DOUBLE)"
            case Some((ea, eb)) =>
              val (ax, ay) = endpoint[String](ea, "CAST(row AS DOUBLE)",
                "CAST(col AS DOUBLE)", t)(SqlAr)
              val (bx, by) = endpoint[String](eb, "CAST(row AS DOUBLE)",
                "CAST(col AS DOUBLE)", t)(SqlAr)
              Seq(ax, ay, bx, by)(coord)
          }
          val v = if (inSegs == outSegs) mk(inSegs)
          else s"(CASE WHEN cin THEN ${mk(inSegs)} ELSE ${mk(outSegs)} END)"
          s"(CASE WHEN bits = $bs THEN $v ELSE $acc END)"
      }
    def slotSelect(slot: Int): String = {
      val present =
        if (slot == 0) "bits BETWEEN 1 AND 14" else "bits IN (5, 10)"
      s"""SELECT row, col, CAST($slot AS BIGINT) AS seg,
         |  ${coordCase(slot, 0)} AS ax, ${coordCase(slot, 1)} AS ay,
         |  ${coordCase(slot, 2)} AS bx, ${coordCase(slot, 3)} AS by
         |FROM g WHERE $present""".stripMargin
    }
    s"""WITH cpx AS (SELECT row, col, $b FROM $pxRel),
       |ch AS (SELECT row, col, $b,
       |        LEAD($b, 1) OVER (PARTITION BY row ORDER BY col) AS z2
       |      FROM cpx),
       |cv AS (SELECT row, col, $b, z2,
       |        LEAD($b, 1) OVER vo AS z4, LEAD(z2, 1) OVER vo AS z3
       |      FROM ch WINDOW vo AS (PARTITION BY col ORDER BY row)),
       |g AS MATERIALIZED (SELECT row, col, $bits AS bits, $cin AS cin,
       |        $tCols
       |      FROM cv
       |      WHERE $b IS NOT NULL AND z2 IS NOT NULL
       |        AND z3 IS NOT NULL AND z4 IS NOT NULL)
       |${slotSelect(0)}
       |UNION ALL
       |${slotSelect(1)}""".stripMargin
  }
}
