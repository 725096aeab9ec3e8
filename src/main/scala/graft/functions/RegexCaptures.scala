package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Run a regex *once* per input line and return every capture group as an
  * `array<string>`: element 1 = group 0 (full match), element i+1 = group i.
  * Returns NULL when the pattern does not match at all; a group that did not
  * participate in the match yields a NULL element.
  *
  * This is the Spark-native analog of the reference's shared pattern bank
  * (`ParsingInput::new`, reference `src/data_model.rs:172-199`): every
  * declared pattern is executed once per line and its capture results are
  * shared by all columns bound to it. It also gives the *distinguishable*
  * null semantics `regexp_extract` cannot: no-match vs empty-match vs
  * non-participating optional group (needed for BOOLEAN group-existence
  * columns, reference `src/data_model.rs:339-353`).
  *
  * Codegen: full `doGenCode` (no `CodegenFallback`) so the parse stage stays
  * inside whole-stage codegen; the `java.util.regex.Pattern` is compiled once
  * per task and referenced from generated code (vs the reference's
  * `regexp_matches`, which recompiles its pattern per row —
  * `src/execution/expression_execution.rs:305-317`).
  */
case class RegexCaptures(child: Expression, pattern: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "regex_captures"

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  override def nullSafeEval(input: Any): Any = {
    val m = compiled.matcher(input.asInstanceOf[UTF8String].toString)
    if (!m.find()) null
    else {
      val n = m.groupCount()
      val arr = new Array[Any](n + 1)
      var i = 0
      while (i <= n) {
        val g = m.group(i)
        arr(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericArrayData(arr)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", compiled,
      classOf[java.util.regex.Pattern].getName)
    val arrCls = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, input => {
      val m = ctx.freshName("m")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      val n = ctx.freshName("n")
      s"""
         |java.util.regex.Matcher $m = $patRef.matcher($input.toString());
         |if ($m.find()) {
         |  int $n = $m.groupCount();
         |  Object[] $arr = new Object[$n + 1];
         |  for (int $i = 0; $i <= $n; $i++) {
         |    String $g = $m.group($i);
         |    $arr[$i] = $g == null ? null : UTF8String.fromString($g);
         |  }
         |  ${ev.value} = new $arrCls($arr);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexCaptures {
  import org.apache.spark.sql.graftbridge.Bridge
  /** `regex_captures(line, pattern)` as a Column. */
  def apply(line: Column, pattern: String): Column =
    Bridge.column(RegexCaptures(Bridge.expression(line), pattern))
}
