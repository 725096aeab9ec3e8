package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic token-array generator `(seqId, nTok) -> array<int>` —
  * the same 31-bit LCG + xor-shift chain as
  * [[graft.pipeline.TokenSequences]] (and its DuckDB oracle CTE), but as
  * a single codegen'd expression with one primitive allocation per row.
  *
  * Why not `transform(sequence(1, n), ...)`: Spark's higher-order
  * functions evaluate *interpreted* — per element they box the lambda
  * variable and every intermediate of the arithmetic chain. At 32
  * local cores the resulting allocation rate makes token generation
  * scale NEGATIVELY with parallelism (GC contention) — measured 10.2s
  * (8 cores) -> 16.8s (32 cores) on 400k rows before this expression,
  * vs linear scaling after.
  */
case class TokenGen(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_gen"

  override def nullSafeEval(seqId: Any, nTok: Any): Any =
    TokenGen.compute(seqId.asInstanceOf[Long], nTok.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seqId, nTok) =>
      s"${ev.value} = graft.functions.TokenGen.compute($seqId, $nTok);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `token_gen_packed(seqId, nTok)` — the SAME token chain as [[TokenGen]]
  * emitted directly in the uint16 transport encoding of
  * [[PackTokens]] (little-endian, byte-identical to
  * `pack_tokens(token_gen(seqId, nTok))`, spec-asserted). Exists for
  * integrity checks that compare against the packed transport: the
  * two-step form allocates and round-trips a ~2 KB int array per row
  * that the fused form never materializes (valid because the generator's
  * vocab 50257 < 2^16 by construction). */
case class TokenGenPacked(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "token_gen_packed"

  override def nullSafeEval(seqId: Any, nTok: Any): Any =
    TokenGen.computePacked(seqId.asInstanceOf[Long], nTok.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seqId, nTok) =>
      s"${ev.value} = graft.functions.TokenGen.computePacked($seqId, $nTok);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokenGenPacked {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(seqId: Column, nTok: Column): Column =
    Bridge.column(TokenGenPacked(Bridge.expression(seqId), Bridge.expression(nTok)))
}

/** Optimizer rule: `pack_tokens(token_gen(s, n))` → `token_gen_packed(s,
  * n)` — bit-identical (spec-asserted) with no ~2 KB int-array
  * intermediate per row. The composition only becomes visible to a rule
  * after CollapseProject merges the generator and transport projections,
  * which is why this is an optimizer rewrite rather than an API-level
  * substitution: callers compose `PackTokens(col("tokens"))` over an
  * arbitrary input column and the fusion fires exactly when that column
  * IS the generator. */
object FusePackedTokenGen
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case PackTokens(TokenGen(seqId, nTok)) => TokenGenPacked(seqId, nTok)
    }

  /** Idempotently attach to the session's experimental optimizer rules. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(this))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ this
    }
}

object TokenGen {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(seqId: Column, nTok: Column): Column =
    Bridge.column(TokenGen(Bridge.expression(seqId), Bridge.expression(nTok)))

  private final val M = 2147483648L // 2^31
  private final val A = 1103515245L
  private final val C = 12345L
  final val Vocab = 50257L

  /** Identical math to TokenSequences / the DuckDB CTE (seqId reduced
    * mod 2^31 first so arithmetic seq_ids up to 2^53 cannot overflow):
    * u = (s + j*48271) % M; v = u ^ (u >>> 15); t = ((v*A + C) % M) % Vocab. */
  def compute(seqId: Long, nTok: Int): ArrayData = {
    val s = ((seqId % M) * 131071L + 524287L) % M
    val out = new Array[Int](if (nTok < 0) 0 else nTok)
    var j = 1
    while (j <= out.length) {
      val u = (s + j * 48271L) % M
      val v = u ^ (u >>> 15)
      out(j - 1) = (((v * A + C) % M) % Vocab).toInt
      j += 1
    }
    new IntArrayData(out) // zero-copy view; see PrimitiveArrayData
  }

  /** [[compute]]'s chain written straight into the [[PackTokens]] uint16
    * little-endian encoding — one 2-byte write per token, no int array. */
  def computePacked(seqId: Long, nTok: Int): Array[Byte] = {
    val s = ((seqId % M) * 131071L + 524287L) % M
    val n = if (nTok < 0) 0 else nTok
    val out = new Array[Byte](n * 2)
    var j = 1
    while (j <= n) {
      val u = (s + j * 48271L) % M
      val v = u ^ (u >>> 15)
      val t = (((v * A + C) % M) % Vocab).toInt
      out((j - 1) * 2) = t.toByte
      out((j - 1) * 2 + 1) = (t >>> 8).toByte
      j += 1
    }
    out
  }
}
