package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.pipeline.{LogPipeline, TokenSequences}
import graft.sql.SqlEngine

/** Queries exercised *through the SQL front-end* (graft.sql): sqlgrep-SQL
  * text -> parse -> Catalyst plan, over the rendered token-sequence log
  * lines — the full reference user path, oracled in DuckDB against the
  * generating model. */
object SqlQueries {
  type Q = (SparkSession, String) => DataFrame

  private val ddl =
    """CREATE TABLE seqlog(
      |    line = 'ingest\\[(\\d+)\\]: sequence (doc-\\d+) from (\\S+) n_tok=(\\d+)',
      |    line[2] => doc TEXT,
      |    line[3] => src TEXT,
      |    line[4] => n INT
      |);
      |CREATE TABLE durlog(
      |    line = 'dur (doc-\\d+) took (\\d+:\\d+:\\d+)',
      |    line[1] => doc TEXT,
      |    line[2] => took INTERVAL
      |);""".stripMargin

  private def engine(s: SparkSession): SqlEngine = {
    val e = new SqlEngine(s)
    e.addTables(ddl)
    e
  }

  private def lines(s: SparkSession, dir: String): DataFrame =
    LogPipeline.renderLines(TokenSequences.fromLineitem(s, dir)).select(col("line"))

  private def cte: String = "WITH " + TokenSequences.duckdbCte + ",\n" +
    // only ingest-class lines match the seqlog pattern
    """ingest AS (
      |  SELECT doc_id AS doc, source AS src, CAST(n_tok AS BIGINT) AS n
      |  FROM tokenseq WHERE __r3 % 37 != 0 AND n_tok < 512)
      |""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_sql_select" -> ((s, dir) =>
      engine(s).query(
        "SELECT doc, src, n FROM seqlog WHERE n >= 100 AND src != 'web'",
        lines(s, dir)).orderBy(col("doc"))),

    "q_sql_agg" -> ((s, dir) =>
      engine(s).query(
        "SELECT src, COUNT() AS n_rows, SUM(n) AS sum_tok, AVG(n) AS avg_tok, MAX(n) * 2 AS max2 FROM seqlog GROUP BY src",
        lines(s, dir))),

    "q_sql_having" -> ((s, dir) =>
      engine(s).query(
        "SELECT src, COUNT() AS n_rows FROM seqlog WHERE n < 256 GROUP BY src HAVING COUNT() > 500",
        lines(s, dir))),

    // P10/E2 intervals end-to-end: 'H:M:S' regex-extracted as INTERVAL,
    // compared and cast (::int whole seconds, ::real ms-resolution
    // fractional seconds, ::text HH:MM:SS.mmm Display) — the oracle
    // recomputes all three arithmetically from the generating model.
    "q_sql_interval" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.LongType
      val seqs = TokenSequences.fromLineitem(s, dir)
      val durLines = seqs.select(format_string("dur %s took %02d:%02d:%02d",
        col("doc_id"), col("n_tok") % 24, col("__r3") % 60,
        (col("__r3") / 60).cast(LongType) % 60).as("line"))
      engine(s).query(
        "SELECT doc, took::int AS secs, took::real AS secs_r, took::text AS disp " +
          "FROM durlog WHERE took::int >= 43200", durLines)
        .orderBy(col("doc"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_sql_select" -> (cte +
      "SELECT doc, src, n FROM ingest WHERE n >= 100 AND src != 'web' ORDER BY doc"),
    "q_sql_agg" -> (cte +
      """SELECT src, count(*) AS n_rows, CAST(sum(n) AS BIGINT) AS sum_tok,
         CAST(sum(n) // count(n) AS BIGINT) AS avg_tok,
         max(n) * 2 AS max2
         FROM ingest GROUP BY src ORDER BY src"""),
    "q_sql_having" -> (cte +
      """SELECT src, count(*) AS n_rows FROM ingest WHERE n < 256
         GROUP BY src HAVING count(*) > 500 ORDER BY src"""),
    "q_sql_interval" -> ("WITH " + TokenSequences.duckdbCte + """
      SELECT doc_id AS doc,
        CAST((n_tok % 24) * 3600 + (__r3 % 60) * 60 + ((__r3 // 60) % 60) AS BIGINT) AS secs,
        CAST((n_tok % 24) * 3600 + (__r3 % 60) * 60 + ((__r3 // 60) % 60) AS DOUBLE) AS secs_r,
        printf('%02d:%02d:%02d.000', n_tok % 24, __r3 % 60, (__r3 // 60) % 60) AS disp
      FROM tokenseq
      WHERE (n_tok % 24) * 3600 + (__r3 % 60) * 60 + ((__r3 // 60) % 60) >= 43200
      ORDER BY doc""")
  )
}
