package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** MinHash signature of a shingle array: for every hash function
  * `k in [0, numHashes)`, the minimum over shingles of
  * `murmur3(shingle, k)` — the per-document signature that MinHash/LSH
  * dedup bands into bucket keys (reference near-dup surface; Broder,
  * "On the resemblance and containment of documents", 1997).
  *
  * BIT-IDENTICAL to the HOF formulation it replaces
  * (`array((0 until numHashes).map(k => array_min(transform(sh, s =>
  * hash(s, lit(k))))))`): Spark's `hash(s, lit(k))` chains
  * `h = hashUnsafeBytes(s, seed=42); h = hashInt(k, h)` — the same
  * murmur3 calls made here. But the HOF version is a CodegenFallback
  * that allocates `numHashes` interpreted lambda frames per shingle per
  * row AND re-hashes the shingle bytes once per hash function; this
  * expression is whole-stage-codegen'd, hashes each shingle's bytes
  * ONCE (the per-k tail is a 5-op integer mix), and allocates nothing
  * but the output array. Empty input yields `numHashes` NULLs (exactly
  * what `array_min` over an empty transform yields) — callers filter
  * empty shingle sets before signing.
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($input, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(shingles: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), numHashes))

  /** Called from both interpreted eval and generated code. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes)) // all NULL
    val mins = new Array[Int](numHashes)
    java.util.Arrays.fill(mins, Int.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // hash(s, lit(k)) parity: string bytes once with Spark's default
      // seed 42, then the per-k integer mix
      val base = Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
      var k = 0
      while (k < numHashes) {
        val h = Murmur3_x86_32.hashInt(k, base)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
