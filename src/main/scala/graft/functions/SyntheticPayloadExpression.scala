package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/**
 * Deterministic synthetic media payload as ONE codegen'd expression: byte j
 * of row `id` is
 *
 *   b_j = ((((id*64 + j + 7) * 1664525 + 1013904223) mod 2^32) >> 16) mod 256
 *
 * — bit-identical to the 64-term hex/lpad/concat + unhex Column pyramid it
 * replaces in Multimodal.syntheticMedia (round-4 verdict optional #10: the
 * wide-expression form paid a per-query codegen compile cost that grows
 * linearly with payload size; this is one loop). The LCG definition and the
 * m_media_features DuckDB oracle are UNCHANGED — the oracle re-derives these
 * exact bytes relationally, and the gate row pins the equality.
 *
 * Overflow audit (ANSI throws): id is a row number (< 2^25 at any fixture
 * size), so (id*64 + 71) * 1664525 < 2^56 and + 1013904223 stays < 2^62.
 */
case class SyntheticPayload(child: Expression, numBytes: Int) extends UnaryExpression {
  require(numBytes > 0 && numBytes <= (1 << 20), "numBytes must be in (0, 2^20]")
  private final val M = 4294967296L

  override def dataType: DataType = BinaryType
  override def prettyName: String = "synthetic_payload"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires bigint, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val out = new Array[Byte](numBytes)
    var j = 0
    while (j < numBytes) {
      val v = ((id * numBytes + j + 7) * 1664525L + 1013904223L) % M
      out(j) = ((v >>> 16) % 256L).toByte
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("syntheticPayloadExpr", this, classOf[SyntheticPayload].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      byte[] ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = (byte[]) $self.nullSafeEval(${childGen.value});
      }""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SyntheticPayload {
  import org.apache.spark.sql.graftshim.Bridge.{column, expression}
  def apply(id: Column, numBytes: Int): Column = column(SyntheticPayload(expression(id), numBytes))
}
