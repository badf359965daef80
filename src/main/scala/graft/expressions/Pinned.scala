package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, RuntimeReplaceable, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Type-pinning no-op around a not-yet-resolved expression.
  *
  * Catalyst's `With`/`CommonExpressionDef` (used by [[graft.profile.Validators]]
  * to evaluate shared sub-expressions once per row) calls `dataType` on its
  * defs during every `withNewChildrenInternal`, including analyzer passes
  * where the def is still an `UnresolvedFunction` — which throws. Pinning
  * the def's top node with the statically-known type makes those calls
  * total; once the child resolves, the real type is reported, and the
  * optimizer's `ReplaceExpressions` strips this node entirely before
  * codegen (standard `RuntimeReplaceable` contract), so there is zero
  * runtime cost.
  */
case class Pinned(child: Expression, pinnedType: DataType)
    extends UnaryExpression with RuntimeReplaceable {
  override lazy val replacement: Expression = child
  // `classic.ColumnNodeExpression` (the lazy Column→Expression wrapper)
  // reports resolved=true with dataType=NullType until the analyzer
  // converts it, so "resolved" alone can't be trusted here.
  override def dataType: DataType = {
    val t =
      if (child.resolved)
        try child.dataType
        catch { case _: Exception => pinnedType }
      else pinnedType
    if (t == org.apache.spark.sql.types.NullType) pinnedType else t
  }
  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): Pinned =
    copy(child = newChild)
}
