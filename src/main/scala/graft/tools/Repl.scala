package graft.tools

import java.io.{BufferedReader, InputStreamReader}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core._
import graft.sources.Sinks
import graft.sql.SqlEngine

/** Interactive REPL — the reference CLI's primary UX re-expressed over
  * [[SqlEngine]] (reference `src/main.rs:92-140`): a prompt loop that
  * accepts CREATE TABLE / SELECT statements (multi-statement input
  * works), `exit` to quit, and `\d [table]` introspection printing
  * Column | Type | Nullable | Default value exactly like the reference's
  * TablePrinter (`src/main.rs:238-272`, `src/helpers.rs:4-80`). Results
  * print through the text sink ([[Sinks.text]], Value::Display formats).
  *
  * Usage: `runMain graft.tools.Repl <input-file> [ddl-file]` — the input
  * file backs FROM tables (a `FROM t::'file'` in the query overrides it,
  * as in the reference).
  */
object Repl {

  private def typeName(t: ValueType): String = t match {
    case ValueType.IntT => "int"
    case ValueType.RealT => "real"
    case ValueType.BoolT => "boolean"
    case ValueType.TextT => "text"
    case ValueType.TimestampT => "timestamp"
    case ValueType.IntervalT => "interval"
    case ValueType.ArrayT(e) => typeName(e) + "[]"
  }

  /** Aligned-columns table (reference TablePrinter, src/helpers.rs:4-80). */
  private def printTable(header: Seq[String], rows: Seq[Seq[String]]): Unit = {
    val all = header +: rows
    val widths = header.indices.map(i => all.map(_(i).length).max)
    def fmt(r: Seq[String]) =
      r.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString(" | ")
    println(fmt(header))
    println(widths.map("-" * _).mkString("-+-"))
    rows.foreach(r => println(fmt(r)))
  }

  private def describe(eng: SqlEngine, parts: Array[String]): Unit =
    parts.lift(1) match {
      case Some(name) =>
        try {
          val td = eng.tableDef(name)
          printTable(Seq("Column", "Type", "Nullable", "Default value"),
            td.columns.map(c => Seq(c.name, typeName(c.tpe),
              (!c.notNull).toString, c.default.map(_.toString).getOrElse("NULL"))))
        } catch {
          case _: IllegalArgumentException =>
            println(s"'$name' is not a defined table.")
        }
      case None =>
        printTable(Seq("Table"), eng.tableNames.map(Seq(_)))
    }

  def main(args: Array[String]): Unit = {
    val inputFile = args.headOption.getOrElse {
      System.err.println("usage: Repl <input-file> [ddl-file]"); sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = new SqlEngine(spark)
    args.lift(1).foreach { ddlFile =>
      val names = eng.addTables(
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(ddlFile))))
      println(s"defined tables: ${names.mkString(", ")}")
    }
    val lines: DataFrame = spark.read.text(inputFile).cache()

    val in = new BufferedReader(new InputStreamReader(System.in))
    var done = false
    while (!done) {
      print("> ")
      Console.flush()
      val line = in.readLine()
      if (line == null || line.trim == "exit") done = true
      else if (line.trim.isEmpty) ()
      else if (line.trim.startsWith("\\d")) describe(eng, line.trim.split("\\s+"))
      else {
        try {
          eng.execute(line, lines).foreach { df =>
            Sinks.text(df).collect().foreach(r => println(r.getString(0)))
          }
        } catch {
          case e: Exception => println(s"error: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
