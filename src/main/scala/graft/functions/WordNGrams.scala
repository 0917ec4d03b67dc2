package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst Generator (table function, cf. built-in `explode`): emit the word
  * n-grams of a string, lower-cased, split on runs of whitespace. Proof of the UDTF
  * surface (SURVEY.md §2.10 — the reference exposes Trino's @ScalarFunction SPI;
  * Spark's equivalent extension point for table functions is `Generator`).
  */
case class WordNGrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType && n.dataType == IntegerType && n.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, foldable int), got (${child.dataType}, ${n.dataType})")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    val size = n.eval(input)
    if (text == null || size == null) return Iterator.empty
    val k = size.asInstanceOf[Int]
    val words = text.asInstanceOf[UTF8String].toString
      .toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (words.length < k) Iterator.empty
    else (0 to words.length - k).iterator.map { i =>
      InternalRow(UTF8String.fromString(words.slice(i, i + k).mkString(" ")))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), n = newChildren(1))
}
