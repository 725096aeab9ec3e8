package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Timestamp from (year, month, day, hour, minute, sec_micros) integer
  * parts — the hot-path replacement for `try_make_timestamp` in the
  * extractor's E3 timestamp composition (reference
  * `src/data_model.rs:249-308`: parts are integer capture groups, the
  * optional fraction its own group, so the whole composition is integer
  * arithmetic; session timezone is pinned UTC).
  *
  * `try_make_timestamp` routes every row through a Decimal(16,6)
  * seconds cast (BigDecimal churn) and java.time construction inside a
  * try/catch — measured on the 8M-row parse stage: +12.4 s at 16 cores
  * for two timestamp columns, scaling at 0.32 N→4N (the slowest AND
  * least parallel sub-stage, dominating the whole pipeline's scaling
  * number). This expression is branch-light long arithmetic — epoch day
  * via the days-from-civil algorithm (public domain, documented in
  * Howard Hinnant's calendar notes; same math as java.time) — fully
  * inside whole-stage codegen, no allocation, no exceptions.
  *
  * NULL if any part is NULL or out of range (year 0-9999 — year 0 is a
  * valid proleptic-Gregorian year to chrono's `from_ymd_opt`, so a
  * `"0000"` capture composes rather than NULLs; month 1-12,
  * day 1-days_in_month, hour 0-23, minute 0-59, sec_micros in
  * [0, 60_000_000)). One divergence from the Spark builtin, asserted in
  * ComposeTimestampSpec: second == 60 is NULL here — like the
  * reference's chrono `ymd_hms` — where `make_timestamp` treats it as a
  * leap second and rolls to the next minute. Values are micros since
  * epoch, UTC.
  */
case class ComposeTimestamp(year: Expression, month: Expression,
    day: Expression, hour: Expression, minute: Expression,
    secMicros: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(year, month, day, hour, minute, secMicros)
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "compose_timestamp"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      val m = ComposeTimestamp.micros(
        vs(0).asInstanceOf[Number].longValue(), vs(1).asInstanceOf[Number].longValue(),
        vs(2).asInstanceOf[Number].longValue(), vs(3).asInstanceOf[Number].longValue(),
        vs(4).asInstanceOf[Number].longValue(), vs(5).asInstanceOf[Number].longValue())
      if (m == ComposeTimestamp.Invalid) null else m
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = children.map(_.genCode(ctx))
    val inv = s"${Long.MinValue}L"
    val call = cs.map(c => s"(long)(${c.value})").mkString(
      "graft.functions.ComposeTimestamp.micros(", ", ", ")")
    ev.copy(code = code"""
      ${cs.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = ${cs.map(_.isNull).mkString(" || ")};
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = $call;
        if (${ev.value} == $inv) ${ev.isNull} = true;
      }""")
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(year = newChildren(0), month = newChildren(1), day = newChildren(2),
      hour = newChildren(3), minute = newChildren(4), secMicros = newChildren(5))
}

object ComposeTimestamp {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(y: Column, mo: Column, d: Column, h: Column, mi: Column,
      secMicros: Column): Column =
    Bridge.column(ComposeTimestamp(Bridge.expression(y), Bridge.expression(mo),
      Bridge.expression(d), Bridge.expression(h), Bridge.expression(mi),
      Bridge.expression(secMicros)))

  /** Sentinel for invalid parts: far outside the year 0-9999 range this
    * expression can produce, so it can never collide with a real value. */
  final val Invalid: Long = Long.MinValue

  private def daysInMonth(y: Long, m: Long): Long = m match {
    case 1 | 3 | 5 | 7 | 8 | 10 | 12 => 31
    case 4 | 6 | 9 | 11 => 30
    case 2 => if ((y % 4 == 0 && y % 100 != 0) || y % 400 == 0) 29 else 28
    case _ => 0
  }

  /** Micros since epoch (UTC), or [[Invalid]] when out of range.
    * Called from both interpreted eval and generated code. */
  def micros(y: Long, mo: Long, d: Long, h: Long, mi: Long, secU: Long): Long = {
    if (y < 0 || y > 9999 || mo < 1 || mo > 12 || d < 1 || d > daysInMonth(y, mo)
        || h < 0 || h > 23 || mi < 0 || mi > 59
        || secU < 0 || secU >= 60000000L) return Invalid
    // days-from-civil: epoch day of y-mo-d in the proleptic Gregorian
    // calendar (shifts the year to start in March so leap days trail)
    val yy = if (mo <= 2) y - 1 else y
    val era = (if (yy >= 0) yy else yy - 399) / 400
    val yoe = yy - era * 400
    val doy = (153 * (if (mo > 2) mo - 3 else mo + 9) + 2) / 5 + d - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    val epochDay = era * 146097L + doe - 719468L
    ((epochDay * 86400L + h * 3600L + mi * 60L) * 1000000L) + secU
  }
}
