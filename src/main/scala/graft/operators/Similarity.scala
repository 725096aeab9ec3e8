package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — the exact baseline: broadcast the (small)
  *    query set against the corpus; one scan, no corpus shuffle.
  *  - [[lshTopK]] — the scale path: random-hyperplane LSH buckets both
  *    sides; candidates are only within-bucket (multi-probe via several
  *    independent tables), then exact cosine re-rank. Recall is tested
  *    against the brute-force baseline in SimilaritySpec.
  */
object Similarity {

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * The query side must be small (it is broadcast); the corpus is
    * scanned once with no shuffle until the final per-query top-k
    * (a window over |queries| * k rows). */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusEmb: Column,
      queries: DataFrame, queryId: Column, queryEmb: Column,
      k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("nn_id"), corpusEmb.as("c_emb"))
    val q = queries.select(queryId.as("query_id"), queryEmb.as("q_emb"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", Dedup.cosine(col("c_emb"), col("q_emb")))
      .filter(col("nn_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("cos"), col("rank"))
  }

  /** Random-hyperplane signature: `planes` sign bits packed into a long —
    * one codegen'd expression ([[graft.functions.LshSignature]]) whose
    * ±1 plane components are materialized once per JVM; the previous
    * formulation evaluated tables × planes × dims interpreted HOF
    * lambdas PER ROW, which dominates everything at scale. */
  def lshSignature(emb: Column, table: Int, planes: Int): Column =
    graft.functions.LshSignature(emb, table, planes)

  /** LSH-bucketed ANN: `tables` independent hash tables of `planes`
    * hyperplanes each; a corpus row is a candidate for a query iff they
    * share a bucket in at least one table. Candidates deduped, then
    * exact cosine re-rank to top-k. */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusEmb: Column,
      queries: DataFrame, queryId: Column, queryEmb: Column,
      k: Int, tables: Int = 8, planes: Int = 12): DataFrame = {
    val c = corpus.select(corpusId.as("nn_id"), corpusEmb.as("c_emb"))
    val q = queries.select(queryId.as("query_id"), queryEmb.as("q_emb"))
    def buckets(df: DataFrame, emb: String): DataFrame =
      df.withColumn("tb", explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), lshSignature(col(emb), t, planes).as("sig"))): _*)))
        .select(df.columns.map(col) :+ col("tb.t").as("t") :+ col("tb.sig").as("sig"): _*)
    val cb = buckets(c, "c_emb")
    val qb = buckets(q, "q_emb")
    val candidates = cb.join(qb, Seq("t", "sig"))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("nn_id"), col("c_emb"), col("q_emb"))
      .dropDuplicates("query_id", "nn_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    candidates.withColumn("cos", Dedup.cosine(col("c_emb"), col("q_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("cos"), col("rank"))
  }
}
