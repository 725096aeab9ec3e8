package graft

import java.io.{ByteArrayOutputStream, PrintStream}

import org.apache.spark.sql.functions._

/** The REPL console print path must stream via `toLocalIterator` (one
  * partition resident on the driver at a time — round-5 verdict
  * finding #2) while producing byte-identical output, in the identical
  * order, to the full-collect print it replaced. */
class ReplStreamSpec extends SparkSpec {

  test("printRows output is identical (content and order) to collect-print") {
    // multi-partition frame large enough that partition boundaries matter
    val df = spark.range(0, 100000, 1, 16)
      .select(concat(lit("row-"), col("id")).as("value"))
    val out = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(out, true, "UTF-8")) {
      graft.tools.Repl.printRows(df)
    }
    val streamed = out.toString("UTF-8")
    val collected = df.collect().map(_.getString(0)).mkString("", "\n", "\n")
    assert(streamed === collected)
  }
}
