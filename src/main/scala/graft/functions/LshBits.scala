package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane (sign-random-projection / Charikar) LSH signature of a FLOAT
  * vector: `numBits` sign bits packed into a LONG. Plane components are Rademacher
  * (+1/-1) values derived from a deterministic 64-bit mix of (seed, bit, dim), so the
  * signature is reproducible across executors with no broadcast plane matrix —
  * important at 100 TB, where shipping a dense plane matrix per task would be waste.
  *
  * Hamming distance between signatures estimates angular distance; used by the ANN
  * path (graft.operators.Similarity) to bucket vectors before exact re-ranking.
  */
case class RandomHyperplaneBits(child: Expression, numBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  require(numBits >= 1 && numBits <= 64, "numBits must be in [1, 64]")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float>, got $other")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "rh_bits"

  // splitmix64 finalizer — deterministic pseudo-random sign per (seed, bit, dim)
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val d = v.numElements()
    var bits = 0L
    var j = 0
    while (j < numBits) {
      var dot = 0.0
      var i = 0
      while (i < d) {
        val sign = if ((mix(seed * 1315423911L + j * 2654435761L + i) & 1L) == 0L) 1.0 else -1.0
        dot += sign * v.getFloat(i)
        i += 1
      }
      if (dot >= 0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
