package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/**
 * MinHash signature over word n-gram shingles as ONE custom Catalyst
 * expression (SURVEY.md preference order (b): custom Expression beats
 * composing interpreted higher-order functions).
 *
 * Input is the WORD array; shingling happens inside the loop by combining a
 * rolling window of n per-word hashes — shingle strings are never
 * materialized (the concat_ws/slice formulation spends most of its time
 * building strings through interpreted lambdas). Each word is hashed once;
 * sig[s] = min over windows of mix(windowHash, s).
 *
 * doGenCode ships the expression as a codegen reference object (same pattern
 * as JsonSchemaExpr) so surrounding stages keep whole-stage codegen.
 */
case class MinHashSignature(child: Expression, n: Int, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 1024, "k must be in (0, 1024]")
  require(n > 0 && n <= 16, "n must be in (0, 16]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got $other")
    }

  @inline private def mix(h0: Long, seed: Long): Long = {
    // splitmix64-style finalizer over (base hash ^ seed-constant)
    var h = h0 ^ (seed * 0x9E3779B97F4A7C15L)
    h ^= h >>> 30; h *= 0xBF58476D1CE4E5B9L
    h ^= h >>> 27; h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val numElems = arr.numElements()
    // per-word 64-bit base hash, computed once; empty/null tokens of the RAW
    // split array are skipped here (compacting) so callers never need an
    // interpreted filter-HOF upstream (round-4 verdict #2)
    var wordHash = new Array[Long](numElems)
    var i = 0
    var numWords = 0
    while (i < numElems) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.numBytes > 0) {
          val lo = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
          val hi = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 1042)
          wordHash(numWords) = (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
          numWords += 1
        }
      }
      i += 1
    }
    if (numWords != numElems) wordHash = java.util.Arrays.copyOf(wordHash, numWords)
    val sig = Array.fill(k)(Long.MaxValue)
    val windows = math.max(numWords - n + 1, if (numWords > 0) 1 else 0)
    var w = 0
    while (w < windows) {
      // order-sensitive combination of the n word hashes in this window
      var h0 = 0x27D4EB2F165667C5L
      var d = 0
      val end = math.min(w + n, numWords)
      var p = w
      while (p < end) { h0 = mix(h0 ^ wordHash(p), d + 1); d += 1; p += 1 }
      var j = 0
      while (j < k) {
        val hv = mix(h0, j + 1)
        if (hv < sig(j)) sig(j) = hv
        j += 1
      }
      w += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSignature].getName)
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

object MinHashSignature {
  import org.apache.spark.sql.graftshim.Bridge.{column, expression}
  def apply(words: Column, n: Int, k: Int): Column =
    column(MinHashSignature(expression(words), n, k))
}
