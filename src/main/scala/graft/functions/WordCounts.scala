package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count, for each word in a fixed marker list, how many whitespace-
  * delimited tokens of `text` equal it (ASCII case-insensitively) —
  * returns `array<int>` aligned with the word list.
  *
  * This is the language-ID hot path ([[graft.operators.TextAnalysis]]):
  * the straightforward `size(filter(split(lower(text)), _ === w))` per
  * marker evaluates 15 interpreted HOF lambdas per row and re-splits the
  * text each time — the same anti-pattern TokenGen replaced on the
  * pipeline path. Here the text is scanned ONCE per row, inside
  * whole-stage codegen, no allocations beyond the count array.
  *
  * Token semantics match `split(text, "\\s+")` + equality against a
  * lowercase ASCII marker: tokens are maximal runs of non-whitespace
  * bytes (Java regex `\s` = space, \t, \n, \x0B, \f, \r), folded A-Z →
  * a-z byte-wise. (Full Unicode lower() can only differ on non-ASCII
  * tokens, which can never equal an ASCII marker anyway.)
  */
case class WordCounts(child: Expression, words: Seq[String]) extends UnaryExpression {
  require(words.nonEmpty && words.forall(w => w.nonEmpty && w == w.toLowerCase),
    "marker words must be non-empty lowercase")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_counts"

  @transient private lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(input: Any): Any =
    WordCounts.compute(input.asInstanceOf[UTF8String], wordBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("markerWords", wordBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.WordCounts.compute($input, $wordsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordCounts {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(text: Column, words: Seq[String]): Column =
    Bridge.column(WordCounts(Bridge.expression(text), words))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  /** Fold A-Z to a-z; all other bytes unchanged. */
  private def fold(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String, words: Array[Array[Byte]]): GenericArrayData = {
    val bytes = text.getBytes
    val counts = new Array[Int](words.length)
    val n = bytes.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      val len = i - start
      if (len > 0) {
        var w = 0
        while (w < words.length) {
          val word = words(w)
          if (word.length == len) {
            var j = 0
            while (j < len && fold(bytes(start + j)) == word(j)) j += 1
            if (j == len) counts(w) += 1
          }
          w += 1
        }
      }
    }
    new GenericArrayData(counts)
  }
}
