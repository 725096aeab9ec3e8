package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.TableDef
import graft.parse.Extractor

/** Follow mode (`tail -f`) re-expressed as Structured Streaming
  * (reference `FollowFileExecutor`, `src/executor.rs:175-234`): the
  * reference polls a file for appended lines, re-runs the statement per
  * line, and for aggregates reprints the ENTIRE updated result each
  * update — i.e. exactly Spark's *complete* output mode over a file
  * stream. Non-aggregate follow queries are *append* mode.
  *
  * Superset vs the reference: joins work in follow mode here
  * (stream-static joins) — the reference rejects them
  * (`src/executor.rs:209-211`); and the source scales to a directory of
  * growing files across executors instead of one file on one thread.
  */
object FollowStream {

  /** Follow a directory of text files as a stream of raw lines. */
  def lines(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.text(dir)

  /** Parse a followed line stream with a [[TableDef]] — the extraction
    * stage is pure Catalyst expressions, so it applies to a streaming
    * DataFrame unchanged. */
  def parsed(spark: SparkSession, dir: String, table: TableDef): DataFrame =
    Extractor.parse(lines(spark, dir), table)

  /** Run an aggregate over the followed stream in complete mode into an
    * in-memory table named `queryName` — each trigger re-emits the full
    * aggregate state, which is the reference's clear-screen-and-reprint
    * behavior (`src/executor.rs:218-229`). */
  def aggregateToMemory(agg: DataFrame, queryName: String): StreamingQuery =
    agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Non-aggregate follow (projection/filter): append mode. */
  def selectToMemory(sel: DataFrame, queryName: String): StreamingQuery =
    sel.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
}
