package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Rabin-Karp style) over the
  * whitespace-split words of `lower(text)` — order-sensitive document
  * fingerprint. Bit-identical to the HOF formulation it replaces
  * (`aggregate(split(lower(text), "\s+"), 0L, (acc, w) =>
  * (acc*31 + crc32(w) % 1000003) % 2^31)`, including Spark split's
  * leading/trailing empty tokens and `crc32("") == 0`), but one
  * codegen'd byte scan instead of an interpreted lambda per word —
  * `aggregate` is CodegenFallback, the TokenGen/Shingles lesson. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, input => s"graft.functions.RollingHash.compute($input)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(text: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(text)))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String): Long = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val crc = new java.util.zip.CRC32()
    var acc = 0L
    def fold(s: Int, e: Int): Unit = {
      crc.reset()
      crc.update(bytes, s, e - s)
      acc = (acc * 31L + crc.getValue % 1000003L) % 2147483648L
    }
    // token spans under split("\s+", -1): empty token at the front/back
    // when the text starts/ends with whitespace; split("") == [""]
    if (len == 0) { fold(0, 0); return acc }
    if (isWs(bytes(0))) fold(0, 0)
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val s = i
        while (i < len && !isWs(bytes(i))) i += 1
        fold(s, i)
      }
    }
    if (isWs(bytes(len - 1))) fold(len, len)
    acc
  }
}
