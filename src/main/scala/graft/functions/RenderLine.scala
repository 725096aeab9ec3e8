package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The scaling workload's log-line renderer: one codegen expression
  * producing the ingest / bulk / audit line for a sequence row from
  * `(doc_id, source, n_tok, __r3)` — byte-identical to the
  * `when(...).when(...).otherwise(format_string(...))` chain it replaces
  * in [[graft.pipeline.LogPipeline.renderLines]] (the regexes there
  * round-trip every byte, and `q_pipe_parse` oracles the extraction).
  *
  * Why: `format_string` builds a `java.util.Formatter` + StringBuilder,
  * re-parses its format string, and boxes every argument PER ROW — at 8M+
  * rows × 16 task threads the render stage's allocation churn is shared
  * memory-bus traffic that the wide parallelism level pays twice (GC and
  * bandwidth), exactly the resource that limits N→4N scaling on one box.
  * Here: one exact-size byte buffer, digits written directly, one
  * UTF8String wrapper — no boxing, no Formatter, no intermediate Strings.
  */
case class RenderLine(docId: Expression, source: Expression,
    nTok: Expression, r3: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(docId, source, nTok, r3)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "render_line"
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val d = docId.eval(input); val s = source.eval(input)
    val n = nTok.eval(input); val r = r3.eval(input)
    if (d == null || s == null || n == null || r == null) null
    else RenderLine.compute(d.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String],
      n.asInstanceOf[Number].intValue(), r.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = children.map(_.genCode(ctx))
    ev.copy(code = code"""
      ${cs.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = ${cs.map(_.isNull).mkString(" || ")};
      UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.RenderLine.compute(
          ${cs(0).value}, ${cs(1).value}, (int)(${cs(2).value}), (long)(${cs(3).value}));
      }""")
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(docId = newChildren(0), source = newChildren(1),
      nTok = newChildren(2), r3 = newChildren(3))
}

object RenderLine {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(docId: Column, source: Column, nTok: Column, r3: Column): Column =
    Bridge.column(RenderLine(Bridge.expression(docId), Bridge.expression(source),
      Bridge.expression(nTok), Bridge.expression(r3)))

  private val Months: Array[Array[Byte]] = Array(
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec").map(_.getBytes("US-ASCII"))
  private val Audit = "AUDIT|".getBytes("US-ASCII")
  private val Year = " 2024 node".getBytes("US-ASCII") // shared " 2024 " + node prefix
  private val Bulk = " bulk[".getBytes("US-ASCII")
  private val Ingest = " ingest[".getBytes("US-ASCII")
  private val BatchSrc = "]: batch ".getBytes("US-ASCII")
  private val SeqFrom = "]: sequence ".getBytes("US-ASCII")
  private val SrcEq = " src=".getBytes("US-ASCII")
  private val From = " from ".getBytes("US-ASCII")
  private val Toks = " toks=".getBytes("US-ASCII")
  private val NTokEq = " n_tok=".getBytes("US-ASCII")
  private val OkTail = "|ok".getBytes("US-ASCII")

  private def put(buf: Array[Byte], p: Int, s: Array[Byte]): Int = {
    System.arraycopy(s, 0, buf, p, s.length); p + s.length
  }
  private def putU(buf: Array[Byte], p: Int, s: UTF8String): Int = {
    s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + p)
    p + s.numBytes
  }
  /** Unpadded non-negative decimal (`%d`). Negative input means a
    * broken generator contract (n_tok/r3 are non-negative by
    * construction); fail loudly rather than silently emitting zero
    * digits and letting a malformed line pass the downstream parse. */
  private def putInt(buf: Array[Byte], p0: Int, v0: Long): Int = {
    if (v0 < 0) throw new IllegalArgumentException(
      s"RenderLine.putInt: negative value $v0 violates the non-negative field contract")
    if (v0 == 0) { buf(p0) = '0'; return p0 + 1 }
    var digits = 0; var v = v0
    while (v > 0) { digits += 1; v /= 10 }
    var p = p0 + digits; v = v0
    while (v > 0) { p -= 1; buf(p) = ('0' + (v % 10)).toByte; v /= 10 }
    p0 + digits
  }
  /** Two-digit zero-padded (`%02d`), 0 <= v < 100. */
  private def put2(buf: Array[Byte], p: Int, v: Long): Int = {
    buf(p) = ('0' + v / 10).toByte; buf(p + 1) = ('0' + v % 10).toByte; p + 2
  }

  /** Render one line; called from interpreted eval and generated code.
    * Line-class rule (must stay in lockstep with the `sinkSql` oracle
    * rule in [[graft.queries.PipelineQueries]]): audit = r3 % 37 == 0,
    * bulk = nTok >= 512, else ingest. */
  def compute(doc: UTF8String, src: UTF8String, nTok: Int, r3: Long): UTF8String = {
    // worst case is an ingest line: 68 fixed/numeric bytes beyond doc+src
    val buf = new Array[Byte](96 + doc.numBytes + src.numBytes)
    var p = 0
    if (r3 % 37 == 0) {
      // AUDIT|%s|%s|%d|ok
      p = put(buf, p, Audit); p = putU(buf, p, doc)
      buf(p) = '|'; p += 1; p = putU(buf, p, src)
      buf(p) = '|'; p += 1; p = putInt(buf, p, nTok)
      p = put(buf, p, OkTail)
    } else {
      // %s %d %02d:%02d:%02d 2024 node%d (bulk|ingest)[%d]: ...
      p = put(buf, p, Months((r3 / 2419200L % 12).toInt))
      buf(p) = ' '; p += 1; p = putInt(buf, p, r3 % 28 + 1)
      buf(p) = ' '; p += 1; p = put2(buf, p, r3 / 28 % 24)
      buf(p) = ':'; p += 1; p = put2(buf, p, r3 / 672 % 60)
      buf(p) = ':'; p += 1; p = put2(buf, p, r3 / 40320 % 60)
      p = put(buf, p, Year); p = putInt(buf, p, r3 % 16)
      val pid = r3 % 9000 + 1000
      if (nTok >= 512) {
        p = put(buf, p, Bulk); p = putInt(buf, p, pid)
        p = put(buf, p, BatchSrc); p = putU(buf, p, doc)
        p = put(buf, p, SrcEq); p = putU(buf, p, src)
        p = put(buf, p, Toks); p = putInt(buf, p, nTok)
      } else {
        p = put(buf, p, Ingest); p = putInt(buf, p, pid)
        p = put(buf, p, SeqFrom); p = putU(buf, p, doc)
        p = put(buf, p, From); p = putU(buf, p, src)
        p = put(buf, p, NTokEq); p = putInt(buf, p, nTok)
      }
    }
    UTF8String.fromBytes(buf, 0, p)
  }
}
