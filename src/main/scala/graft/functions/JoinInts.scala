package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `join_ints(arr)` — byte-identical to
  * `concat_ws(",", cast(arr as array<string>))` for an `array<int>`
  * column (spec-asserted parity, including the empty-array and
  * null-array → "" cases), without materializing one `UTF8String` per
  * element: digits are written straight into a single exact-size byte
  * buffer. The CSV render of a ~500-token array allocated ~500
  * intermediate strings per row via the cast — on the 600k-row token
  * gate that is pure allocator/memory-bus churn (guide §1.2 per-task
  * work), the same class of fix as [[RenderLine]] / [[DocId]].
  */
case class JoinInts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "join_ints"

  // concat_ws never returns null: a NULL array renders as "" (all-null
  // argument list). Mirror that exactly.
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.EMPTY_UTF8
    else JoinInts.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = false;
      UTF8String ${ev.value} = ${c.isNull}
        ? UTF8String.EMPTY_UTF8
        : graft.functions.JoinInts.compute(${c.value});
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JoinInts {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(arr: Column): Column =
    Bridge.column(JoinInts(Bridge.expression(arr)))

  def compute(a: ArrayData): UTF8String = {
    val n = a.numElements()
    if (n == 0) return UTF8String.EMPTY_UTF8
    // pass 1: exact output size (digits + separators; null elements are
    // SKIPPED by concat_ws, separator only between present elements)
    var size = 0
    var present = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        present += 1
        size += digits(a.getInt(i))
      }
      i += 1
    }
    if (present == 0) return UTF8String.EMPTY_UTF8
    size += present - 1
    val out = new Array[Byte](size)
    var p = 0
    i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        if (p > 0) { out(p) = ','; p += 1 }
        p = putInt(out, p, a.getInt(i))
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  private def digits(v0: Int): Int = {
    if (v0 == Int.MinValue) return 11 // -2147483648, abs overflows
    val v = if (v0 < 0) -v0 else v0
    var d = 1
    var p = 10
    while (d < 10 && p <= v) { d += 1; p *= 10 }
    d + (if (v0 < 0) 1 else 0)
  }

  private def putInt(buf: Array[Byte], p0: Int, v0: Int): Int = {
    if (v0 == Int.MinValue) {
      val s = "-2147483648".getBytes
      System.arraycopy(s, 0, buf, p0, s.length)
      return p0 + s.length
    }
    var p = p0
    var v = v0
    if (v < 0) { buf(p) = '-'; p += 1; v = -v }
    val d = digits(v)
    var i = p + d - 1
    while (i >= p) { buf(i) = ('0' + v % 10).toByte; v /= 10; i -= 1 }
    p + d
  }
}
