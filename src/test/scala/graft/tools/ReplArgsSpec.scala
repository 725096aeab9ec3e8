package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** CLI flag parsing — the reference binary's StructOpt surface
  * (`src/main.rs:18-41`) mapped onto [[Repl.parseArgs]]. Pure function,
  * no Spark session needed. */
class ReplArgsSpec extends AnyFunSuite {

  test("reference-shaped invocation parses every flag") {
    val a = Repl.parseArgs(List(
      "-d", "tables.txt", "--format", "csv", "--show-run-stats",
      "-c", "SELECT * FROM t", "a.log", "b.log"))
    assert(a.ddlFile === Some("tables.txt"))
    assert(a.format === "csv")
    assert(a.showRunStats)
    assert(a.command === Some("SELECT * FROM t"))
    assert(a.inputs === Vector("a.log", "b.log"))
    assert(!a.follow && !a.stdin && !a.head)
  }

  test("long/short aliases and follow flags") {
    val a = Repl.parseArgs(List("--data-file", "d.txt", "--follow", "--head",
      "--command-file", "q.sql", "in.log"))
    assert(a.ddlFile === Some("d.txt"))
    assert(a.follow && a.head)
    assert(a.commandFile === Some("q.sql"))
    val b = Repl.parseArgs(List("-f", "in.log"))
    assert(b.follow && b.inputs === Vector("in.log"))
  }

  test("stdin flag; unknown flag and bad format rejected") {
    assert(Repl.parseArgs(List("--stdin", "-c", "q")).stdin)
    intercept[IllegalArgumentException](Repl.parseArgs(List("--bogus")))
    intercept[IllegalArgumentException](
      Repl.parseArgs(List("--format", "yaml", "x.log")))
  }
}
