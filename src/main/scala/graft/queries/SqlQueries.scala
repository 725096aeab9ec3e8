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
      |);
      |CREATE TABLE srcdim(
      |    line = 'dim (\\S+) region (\\S+) tier (\\d+)',
      |    line[1] => sname TEXT,
      |    line[2] => region TEXT,
      |    line[3] => tier INT
      |);
      |CREATE TABLE srcdim3(
      |    line = 'dim (\\S+) region (\\S+) tier (\\d+)',
      |    line[1] => sname TEXT,
      |    line[2] => region TEXT,
      |    line[3] => tier INT
      |);""".stripMargin

  /** All source names the generating model can emit (see
    * [[TokenSequences.withSequenceColumns]]); the join-table gates derive
    * region/tier arithmetically from the name so the DuckDB oracle can
    * regenerate the identical dimension without a literal list. */
  private val allSources: Seq[String] =
    Seq("web", "books", "code") ++ (0 until 17).map(i => s"src$i")

  private def dimLines(s: SparkSession, names: Seq[String]): DataFrame = {
    import s.implicits._
    names.map(n => s"dim $n region r${n.length % 3} tier ${n.length}").toDF("line")
  }

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
        lines(s, dir))),

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
    // Line synthesis via concat + lpad (round 6): byte-identical to the
    // previous format_string for these non-negative fields, without the
    // per-row java.util.Formatter + boxed-argument allocation.
    "q_sql_interval" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.LongType
      val seqs = TokenSequences.fromLineitem(s, dir)
      def p2(c: org.apache.spark.sql.Column) = lpad(c.cast("string"), 2, "0")
      val durLines = seqs.select(concat(
        lit("dur "), col("doc_id"), lit(" took "),
        p2(col("n_tok") % 24), lit(":"), p2(col("__r3") % 60), lit(":"),
        p2((col("__r3") / 60).cast(LongType) % 60)).as("line"))
      engine(s).query(
        "SELECT doc, took::int AS secs, took::real AS secs_r, took::text AS disp " +
          "FROM durlog WHERE took::int >= 43200", durLines)
    }),

    // P6 end-to-end: unary minus in projection + filter, NOT around a
    // comparison (projected boolean is the reference's non-null bool).
    "q_sql_unary" -> ((s, dir) =>
      engine(s).query(
        "SELECT doc, -n AS neg_n, NOT (n >= 256) AS small FROM seqlog " +
          "WHERE NOT (src = 'web') AND -n <= -100",
        lines(s, dir))),

    // make_timestamp (7-arg, reference expression_execution.rs:405-416)
    // + EXTRACT(epoch) + array[...] literal with 1-based postfix index.
    "q_sql_mkts" -> ((s, dir) =>
      engine(s).query(
        "SELECT doc, (EXTRACT(epoch FROM make_timestamp(2024, 3, (n % 27) + 1, " +
          "n % 24, n % 60, n % 60, 0)))::int AS ep, " +
          "array[n, n * 2, 7][2] AS n2 FROM seqlog WHERE n < 120",
        lines(s, dir))),

    // A13 quirk 3: aggregate DISTINCT fires only when HAVING is present —
    // 20 source groups collapse to the distinct count-buckets.
    "q_sql_distinct_having" -> ((s, dir) =>
      engine(s).query(
        "SELECT DISTINCT COUNT() / 1000 AS bucket FROM seqlog GROUP BY src HAVING COUNT() > 10",
        lines(s, dir))),

    // J1/J4/J5: INNER JOIN with qualified names on both sides of ON, in
    // projections, GROUP BY, and a WHERE over a joined column. The join
    // table is parsed from its own log lines (the reference's
    // table::'file' path, lines injected).
    "q_sql_join" -> ((s, dir) =>
      engine(s).query(
        "SELECT seqlog.src AS src, srcdim.region AS region, COUNT() AS n_rows, " +
          "SUM(seqlog.n) AS sum_n FROM seqlog " +
          "INNER JOIN srcdim ON seqlog.src = srcdim.sname " +
          "WHERE srcdim.tier >= 4 GROUP BY seqlog.src, srcdim.region",
        lines(s, dir), joinLines = Some(dimLines(s, allSources)))),

    // J3 through SQL: OUTER (= left outer) join, non-aggregate path —
    // sources missing from the 3-row dimension keep NULL tier.
    "q_sql_join_outer" -> ((s, dir) =>
      engine(s).query(
        "SELECT doc, src, srcdim3.tier AS tier FROM seqlog " +
          "OUTER JOIN srcdim3 ON seqlog.src = srcdim3.sname WHERE n >= 320",
        lines(s, dir), joinLines = Some(dimLines(s, allSources.take(3)))))
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
      ORDER BY doc"""),
    "q_sql_unary" -> (cte +
      """SELECT doc, -n AS neg_n, (NOT (n >= 256)) AS small FROM ingest
         WHERE NOT (src = 'web') AND -n <= -100 ORDER BY doc"""),
    "q_sql_mkts" -> (cte +
      """SELECT doc,
         CAST(trunc(epoch(make_timestamp(2024, 3, (n % 27) + 1, n % 24, n % 60,
           CAST(n % 60 AS DOUBLE)))) AS BIGINT) AS ep,
         [n, n * 2, 7][2] AS n2
         FROM ingest WHERE n < 120 ORDER BY doc"""),
    "q_sql_distinct_having" -> (cte +
      """SELECT DISTINCT CAST(count(*) // 1000 AS BIGINT) AS bucket
         FROM ingest GROUP BY src HAVING count(*) > 10 ORDER BY bucket"""),
    "q_sql_join" -> (cte.stripSuffix("\n") + dimCte("dim", all = true) +
      """SELECT i.src AS src, d.region AS region, count(*) AS n_rows,
         CAST(sum(i.n) AS BIGINT) AS sum_n
         FROM ingest i JOIN dim d ON i.src = d.sname
         WHERE d.tier >= 4 GROUP BY i.src, d.region ORDER BY src, region"""),
    "q_sql_join_outer" -> (cte.stripSuffix("\n") + dimCte("dim3", all = false) +
      """SELECT doc, src, d.tier AS tier
         FROM ingest i LEFT OUTER JOIN dim3 d ON i.src = d.sname
         WHERE i.n >= 320 ORDER BY doc""")
  )

  /** DuckDB replica of [[dimLines]]: region/tier derived from the name. */
  private def dimCte(name: String, all: Boolean): String = {
    val names =
      if (all) """SELECT 'src' || CAST(g AS VARCHAR) AS sname FROM generate_series(0, 16) t(g)
                 UNION ALL SELECT unnest(['web', 'books', 'code']) AS sname"""
      else "SELECT unnest(['web', 'books', 'code']) AS sname"
    s""", $name AS (
       |  SELECT sname, 'r' || CAST(length(sname) % 3 AS VARCHAR) AS region,
       |         length(sname) AS tier
       |  FROM ($names))
       |""".stripMargin
  }
}
