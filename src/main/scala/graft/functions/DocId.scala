package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `doc_id(seqId)` — byte-identical to `format_string("doc-%012d", seqId)`
  * (PipelineSpec asserts parity) without the per-row `java.util.Formatter`
  * + StringBuilder + boxed-Long allocation chain: digits are written
  * directly into one exact-size byte array. The generator stamps every
  * row of the scaling workload with this id, so at 8M rows the Formatter
  * was ~8M needless allocation bundles per run on the map stage — the
  * allocation-latency-bound work the 4N level pays extra for on a
  * shared-bus host (BASELINE.md round 4).
  *
  * Negative ids (never produced by the generators, which guard their key
  * bounds) fall back to `String.format` for exact Formatter parity.
  */
case class DocId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "doc_id_format"

  override def nullSafeEval(id: Any): Any =
    DocId.compute(id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id =>
      s"${ev.value} = graft.functions.DocId.compute($id);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DocId {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(seqId: Column): Column =
    Bridge.column(DocId(Bridge.expression(seqId)))

  def compute(id: Long): UTF8String = {
    // Pin Locale.US like Spark's format_string does: under a non-US
    // default locale (e.g. non-ASCII digit scripts) locale-default
    // String.format would break the claimed byte-parity.
    if (id < 0) return UTF8String.fromString(
      String.format(java.util.Locale.US, "doc-%012d", Long.box(id)))
    var digits = 1
    var p = 10L
    while (digits < 19 && p <= id) { digits += 1; p *= 10 }
    val width = math.max(12, digits)
    val out = new Array[Byte](4 + width)
    out(0) = 'd'; out(1) = 'o'; out(2) = 'c'; out(3) = '-'
    var i = 4 + width - 1
    var v = id
    while (i >= 4) {
      out(i) = ('0' + (v % 10)).toByte
      v /= 10
      i -= 1
    }
    UTF8String.fromBytes(out)
  }
}
