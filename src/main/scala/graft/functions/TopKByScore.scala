package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Distributed bounded top-k: the k highest-`score` rows per group,
  * ordered by (score DESC, id ASC), returned as
  * `array<struct<id, score>>` (index = rank - 1).
  *
  * This is the scale-correct replacement for the
  * `row_number() OVER (PARTITION BY query ORDER BY score DESC)` idiom in
  * ANN re-ranking: a window must shuffle EVERY scored row into its
  * query's single partition and sort the whole group in one task (the
  * brute-force path would move the entire scored corpus through one
  * task per query). As a TypedImperativeAggregate this gets hash
  * aggregation with MAP-SIDE PARTIAL COMBINE: each input partition
  * reduces to at most k rows per group before anything is shuffled, so
  * bytes-on-the-wire are `partitions × groups × k`, independent of
  * corpus size, and the final merge is k-bounded heap work.
  *
  * Buffer = worst-first binary min-heap of (score, id), capacity k.
  * NULL scores/ids are ignored (they cannot outrank anything). Ties on
  * score keep the SMALLEST id — identical to
  * `ORDER BY score DESC, id ASC` row_number ranking (doubles compared
  * like Spark's sort: NaN greatest).
  *
  * Documented divergence from the row_number window this replaced: a
  * window ranks NULL-score rows LAST but still emits them, so a group
  * with fewer than k finite-score candidates could pad its top-k with
  * NULL-cosine rows (reachable only via degenerate / dim-mismatched
  * embeddings, where CosineSim yields NULL); this aggregate drops them,
  * returning fewer than k rows instead. Padding a ranking with
  * undefined similarities was never meaningful output, and the gate
  * corpora contain no such embeddings (verified: `q_ann_bruteforce`
  * row-exact against the DuckDB oracle).
  */
case class TopKByScore(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buffer] with BinaryLike[Expression] {
  require(k >= 1, "k must be >= 1")

  override def left: Expression = score
  override def right: Expression = id
  override def prettyName: String = "top_k_by_score"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", id.dataType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  @transient private lazy val idOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(id.dataType)
  @transient private lazy val idProj = UnsafeProjection.create(Array(id.dataType))

  override def createAggregationBuffer(): TopKByScore.Buffer =
    new TopKByScore.Buffer(k)

  override def update(buf: TopKByScore.Buffer, input: InternalRow): TopKByScore.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i, idOrdering, copyOnKeep = true)
    buf
  }

  override def merge(a: TopKByScore.Buffer, b: TopKByScore.Buffer): TopKByScore.Buffer = {
    var j = 0
    while (j < b.size) {
      a.offer(b.scores(j), b.ids(j), idOrdering, copyOnKeep = false)
      j += 1
    }
    a
  }

  override def eval(buf: TopKByScore.Buffer): Any = {
    val idx = Array.range(0, buf.size).sortWith { (x, y) =>
      val c = java.lang.Double.compare(buf.scores(x), buf.scores(y))
      if (c != 0) c > 0 else idOrdering.lt(buf.ids(x), buf.ids(y))
    }
    new GenericArrayData(idx.map { j =>
      val row = new GenericInternalRow(2)
      row.update(0, buf.ids(j))
      row.update(1, buf.scores(j))
      row
    }.toArray[Any])
  }

  override def serialize(buf: TopKByScore.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var j = 0
    while (j < buf.size) {
      out.writeDouble(buf.scores(j))
      val row = idProj(InternalRow(buf.ids(j)))
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
      j += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKByScore.Buffer(k)
    var j = 0
    while (j < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(1)
      row.pointTo(rowBytes, len)
      // fresh backing array per element: the extracted value may alias it
      buf.offer(s, row.get(0, id.dataType), idOrdering, copyOnKeep = false)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)
}

object TopKByScore {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression())

  /** Worst-first binary min-heap on (score asc, id desc): the root is
    * the element top-k ranking would evict first. */
  final class Buffer(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Any](k)
    var size: Int = 0

    // a@i is WORSE than b@j (ranked later): lower score, or equal score
    // and larger id
    private def worse(si: Double, ii: Any, sj: Double, ij: Any,
        ord: Ordering[Any]): Boolean = {
      val c = java.lang.Double.compare(si, sj)
      if (c != 0) c < 0 else ord.gt(ii, ij)
    }

    def offer(s: Double, rawId: Any, ord: Ordering[Any], copyOnKeep: Boolean): Unit = {
      if (size < k) {
        val v = if (copyOnKeep) InternalRow.copyValue(rawId) else rawId
        var j = size
        scores(j) = s; ids(j) = v; size += 1
        while (j > 0 && worse(scores(j), ids(j), scores((j - 1) / 2), ids((j - 1) / 2), ord)) {
          swap(j, (j - 1) / 2); j = (j - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, rawId, ord)) {
        val v = if (copyOnKeep) InternalRow.copyValue(rawId) else rawId
        scores(0) = s; ids(0) = v
        var j = 0
        var continue = true
        while (continue) {
          val l = 2 * j + 1; val r = 2 * j + 2
          var w = j
          if (l < size && worse(scores(l), ids(l), scores(w), ids(w), ord)) w = l
          if (r < size && worse(scores(r), ids(r), scores(w), ids(w), ord)) w = r
          if (w == j) continue = false
          else { swap(j, w); j = w }
        }
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }
  }
}
