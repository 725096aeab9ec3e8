package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.NullSemantics

/** Output sinks with the reference CLI's formats
  * (`OutputPrinter::print`, reference `src/executor.rs:255-309`).
  * Each returns a single-string-column DataFrame (distributed render —
  * write with `ds.write.text(...)` or collect for console) so the
  * formatting itself is partition-parallel, unlike the reference's
  * driver-side printing.
  */
object Sinks {

  /** Reference value rendering: floats display `{:.2}`, NULLs print as
    * "NULL" in text mode (reference `src/model.rs:335-353`). */
  private def render(df: DataFrame)(f: StructField): Column = {
    val c = col(f.name)
    f.dataType match {
      case _: DoubleType => format_string("%.2f", c)
      case _: ArrayType => to_json(c)
      case _ => c.cast(StringType)
    }
  }

  /** S5 — text sink: `name: value, name: value` per row; a bare `input`
    * projection prints the raw line (reference `src/executor.rs:258-270`). */
  def text(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq
    val rendered =
      if (cols.map(_.name) == Seq("input")) col("input")
      else concat_ws(", ", cols.map(f =>
        format_string(s"${f.name}: %s", coalesce(render(df)(f), lit("NULL")))): _*)
    df.select(rendered.as("value"))
  }

  /** S6 — JSON sink: one JSON object per row
    * (reference `src/executor.rs:271-280`). */
  def json(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  /** S7 — CSV sink: `;`-delimited, header as the first line
    * (reference `src/executor.rs:281-299`). The header travels as a
    * separate 1-row DataFrame unioned first (order preserved only with
    * coalesce(1) on write — header-position is a driver concern at
    * scale, matching Spark's own csv header-per-file model). */
  def csv(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val header = Seq(df.columns.mkString(";")).toDF("value")
    val rows = df.select(concat_ws(";", df.schema.fields.toSeq.map(f =>
      coalesce(render(df)(f), lit(""))): _*).as("value"))
    header.union(rows)
  }
}
