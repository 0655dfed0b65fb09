package graft.functions

import graft.intel.{BcHandle, CleanPreScreen}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ImplicitCastInputTypes}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `might_match(text)` — broadcast clean-turn pre-screen (SURVEY.md §4.3):
  * a codegen'd superset filter evaluated before extraction so clean turns
  * never reach the (more expensive) scanner. False = provably no match in
  * any configured database.
  */
case class MightMatch(child: Expression, screen: BcHandle[CleanPreScreen])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "might_match"

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[UTF8String]
    screen.get.mightMatch(ExtractIoCs.copyToScratch(t), t.numBytes())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // broadcast HANDLE: the screen deserializes once per executor
    val ref = ctx.addReferenceObj("prescreen", screen, "graft.intel.BcHandle")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((graft.intel.CleanPreScreen) $ref.get()).mightMatch(" +
        s"graft.functions.ExtractIoCs.copyToScratch($c), $c.numBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): MightMatch =
    copy(child = newChild)
}

object MightMatch {
  def column(text: Column, screen: CleanPreScreen): Column =
    ExpressionUtils.column(MightMatch(ExpressionUtils.expression(text),
      BcHandle.auto(screen)))
}
