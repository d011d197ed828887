package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * int64 scaling of a float/double vector in ONE codegen'd expression:
 * out[d] = round(vec[d] * 1e7) (HALF_UP — bit-identical to Spark SQL
 * round(x*1e7) and DuckDB round for these magnitudes; same per-component
 * formula as SignBucket.scaleComponent, so bucket assignment and dot products
 * computed from the output agree with the SQL oracle exactly).
 *
 * This replaces transform(vec, x => round(x*1e7).cast(long)) — a
 * CodegenFallback higher-order function that would knock whatever stage hosts
 * it (an index-build projection, a near-dup pair stage) out of whole-stage
 * codegen (CLAUDE.md rule). Null semantics match the HOF: null array -> null;
 * null elements pass through as null elements.
 */
case class ScaleVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "scale_vec"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType | FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double> or array<float>, got $other")
    }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = SignBucket.scaleComponent(x)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("scaleVecExpr", this, classOf[ScaleVec].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $self.nullSafeEval(${childGen.value});
      }""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ScaleVec {
  import org.apache.spark.sql.graftshim.Bridge.{column, expression}
  def apply(vec: Column): Column = column(ScaleVec(expression(vec)))
}
