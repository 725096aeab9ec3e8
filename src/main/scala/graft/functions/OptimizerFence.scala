package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression that reports `deterministic = false` — an
  * optimization FENCE, not a computation.
  *
  * Why it exists: [[graft.parse.Extractor]] wraps each shared-pattern-
  * bank capture column (`__cap_*`) in this fence. Without it, Catalyst's
  * `PushPredicateThroughNonJoin` pushes the row-match filter (`any
  * extracted column IS NOT NULL`, reference `Row::any_result`,
  * `src/data_model.rs:23-25`) through every projection down to the scan,
  * substituting aliases with their defining expressions — with no cost
  * guard — which inlines one `regex_captures` call PER REFERENCED COLUMN
  * (measured: 51 copies for a 3-pattern bank) into the Filter condition,
  * turning one-regex-per-pattern-per-line into one-per-column-per-line.
  * The rule only pushes through a Project whose fields are ALL
  * deterministic (for Project it never inspects the condition — a 1:1
  * projection is always safe to cross), so a single nondeterministic
  * field pins the bank: filters stop just above it and reference the
  * capture arrays as attributes. Evaluation and codegen delegate to the
  * child unchanged.
  */
case class OptimizerFence(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "opt_fence"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OptimizerFence {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(c: Column): Column = Bridge.column(OptimizerFence(Bridge.expression(c)))
}
