package graft

import graft.sources.Sinks

/** Output sink formats (reference `src/executor.rs:255-309`). */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq(
    ("a.com", 3L, 1.5, Seq(1, 2)),
    (null.asInstanceOf[String], 7L, 2.0, Seq(3))
  ).toDF("host", "n", "x", "xs")

  test("text sink: name: value pairs, {:.2} floats, NULL rendering") {
    val lines = Sinks.text(df).as[String].collect()
    assert(lines(0) === "host: a.com, n: 3, x: 1.50, xs: [1,2]")
    assert(lines(1) === "host: NULL, n: 7, x: 2.00, xs: [3]")
  }

  test("json sink: one object per row") {
    val lines = Sinks.json(df).as[String].collect()
    assert(lines(0) === """{"host":"a.com","n":3,"x":1.5,"xs":[1,2]}""")
    assert(lines(1).startsWith("""{"n":7""")) // null field omitted by to_json
  }

  test("csv sink: semicolon-delimited with header first") {
    val lines = Sinks.csv(df.select("host", "n", "x")).as[String].collect()
    assert(lines(0) === "host;n;x")
    assert(lines.toSet.contains("a.com;3;1.50"))
    assert(lines.toSet.contains(";7;2.00"))
  }

  test("bare input projection prints raw line") {
    val raw = Seq("raw line 1", "raw line 2").toDF("input")
    assert(Sinks.text(raw).as[String].collect().toSeq ===
      Seq("raw line 1", "raw line 2"))
  }
}
