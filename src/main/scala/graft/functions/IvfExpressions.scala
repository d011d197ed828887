package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * IVF cell assignment as ONE codegen'd Catalyst expression: the nearest
 * centroid (exact-integer squared L2 distance, ties to the lowest cell id)
 * of an int64-SCALED vector against a small centroid matrix that travels
 * with the plan (the distributed analogue of a broadcast: k x dim longs).
 *
 * The centroids live in the same scaled-integer domain as ScaleVec output
 * (component = round(x * 1e7)), so the distance sum
 * d2(v, c) = SUM_d (v_d - c_d)^2 is pure integer arithmetic — no float
 * summation-order or tie-at-boundary nondeterminism, and the identical
 * computation runs in DuckDB BIGINT SQL (oracle parity; with |x| <= ~1 the
 * per-term square is <= (2e7)^2 = 4e14 and the 64-dim sum <= 2.6e16 < 2^62).
 *
 * Centroids are a Seq-of-Seq (structural equality — an Array field would
 * give the case class identity-based equals and break plan canonicalization
 * / subexpression elimination); eval converts once per JVM to a flat array.
 */
case class NearestCell(child: Expression, centroids: Seq[Seq[Long]]) extends UnaryExpression {
  require(centroids.nonEmpty, "need at least one centroid")
  require(centroids.map(_.length).distinct.size == 1, "ragged centroid matrix")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> (a ScaleVec'd vector), got $other")
    }

  @transient private lazy val matrix: Array[Array[Long]] =
    centroids.map(_.toArray).toArray

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    // null element => no meaningful distance; the result is NULL, never a
    // silently-wrong cell (a fixed cell 0 would diverge from any SQL oracle
    // whose SUM skips NULL terms and assigns by the remaining dims —
    // round-4 advice). Training/build paths filter these rows out.
    var d0 = 0
    while (d0 < dim) { if (arr.isNullAt(d0)) return null; d0 += 1 }
    NearestCell.assignArrayData(arr, dim, matrix)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCellExpr", this, classOf[NearestCell].getName)
    val childGen = child.genCode(ctx)
    val tmp = ctx.freshName("nearestCellRes")
    ev.copy(code = code"""
      ${childGen.code}
      Object $tmp = null;
      if (!${childGen.isNull}) {
        $tmp = $self.nullSafeEval(${childGen.value});
      }
      boolean ${ev.isNull} = ($tmp == null);
      int ${ev.value} = ${ev.isNull} ? 0 : ((Integer) $tmp).intValue();""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NearestCell {
  import org.apache.spark.sql.graftshim.Bridge.{column, expression}

  def apply(scaledVec: Column, centroids: Array[Array[Long]]): Column =
    column(NearestCell(expression(scaledVec), centroids.map(_.toSeq).toSeq))

  private def assignArrayData(arr: ArrayData, dim: Int, m: Array[Array[Long]]): Int = {
    var best = 0
    var bestD2 = Long.MaxValue
    var c = 0
    while (c < m.length) {
      val cen = m(c)
      val n = math.min(dim, cen.length)
      var d2 = 0L
      var d = 0
      while (d < n) { val diff = arr.getLong(d) - cen(d); d2 += diff * diff; d += 1 }
      if (d2 < bestD2) { bestD2 = d2; best = c } // strict <: ties keep lowest cell
      c += 1
    }
    best
  }

  /** Driver-side assignment of a scaled vector (query-time probing). */
  def assign(sv: Array[Long], m: Array[Array[Long]]): Int =
    cellDistances(sv, m).zipWithIndex.minBy { case (d2, c) => (d2, c) }._2

  /** Exact-integer squared L2 distance to every centroid. */
  def cellDistances(sv: Array[Long], m: Array[Array[Long]]): Array[Long] =
    m.map { cen =>
      var d2 = 0L
      var d = 0
      val n = math.min(sv.length, cen.length)
      while (d < n) { val diff = sv(d) - cen(d); d2 += diff * diff; d += 1 }
      d2
    }
}
