package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Foldable constant expression: the engine name. Parity with the reference's single
  * shipped UDF, `current_database()` returning the constant connector name
  * (reference: trino/udfs/CurrentDatabaseUdf.java:10-17, registered at
  * trino/RecordServicePlugin.java:70-78). Foldable ⇒ constant-folded by Catalyst,
  * so it costs nothing at runtime.
  */
case class CurrentEngine() extends LeafExpression {
  override def foldable: Boolean = true
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "current_engine"

  private val value = UTF8String.fromString("graft")

  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("currentEngine", value)
    ev.copy(code = code"", isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode.global(ref, StringType))
  }
}
