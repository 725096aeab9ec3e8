package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The interactive loop's statement semantics (reference
  * `src/main.rs:92-140, 318-331`): multi-line buffering until `;`,
  * `exit` / `\d` complete as-is, and Ctrl-C cancelling the RUNNING
  * query without killing the session. */
class ReplLoopSpec extends AnyFunSuite {

  test("statement completeness: exit / \\d / trailing ; (reference validator)") {
    assert(Repl.isComplete("exit"))
    assert(Repl.isComplete("\\d connections"))
    assert(Repl.isComplete("SELECT * FROM t;"))
    assert(Repl.isComplete("SELECT *\nFROM t;  "))
    assert(!Repl.isComplete("SELECT * FROM t"))
    assert(!Repl.isComplete("SELECT hostname,"))
  }

  test("processLines buffers a two-line statement and dispatches it whole") {
    val got = scala.collection.mutable.ArrayBuffer[String]()
    Repl.processLines(
      Iterator("SELECT hostname, COUNT()", "FROM connections GROUP BY hostname;",
        "\\d", "exit", "never reached"),
      s => { got += s; s == "exit" })
    assert(got.toSeq === Seq(
      "SELECT hostname, COUNT()\nFROM connections GROUP BY hostname;",
      "\\d", "exit"))
  }

  test("processLines flushes a pending unterminated buffer at EOF") {
    val got = scala.collection.mutable.ArrayBuffer[String]()
    Repl.processLines(Iterator("SELECT 1", "FROM t"), s => { got += s; false })
    assert(got.toSeq === Seq("SELECT 1\nFROM t"))
  }
}

/** End-to-end query cancellation: what the REPL's SIGINT handler does
  * (`cancelAllJobs`) must abort a long-running collect quickly and
  * leave the session usable — the reference's per-row AtomicBool check
  * (`src/executor.rs:81-83`) re-expressed through Spark's job
  * cancellation. */
class ReplCancelSpec extends SparkSpec {

  test("cancelJobGroup aborts a long query fast; the session stays usable") {
    import org.apache.spark.sql.functions._
    val slow = spark.range(0, 32, 1, 32)
      .select(udf((x: Long) => { Thread.sleep(30000); x }).apply(col("id")).as("v"))
    val worker = new java.util.concurrent.CompletableFuture[Throwable]()
    val t = new Thread(() => {
      // job group is thread-local: set it on the query thread, exactly
      // as the REPL's dispatch does
      spark.sparkContext.setJobGroup("graft-repl", "slow query",
        interruptOnCancel = true)
      val err = try { slow.collect(); null }
      catch { case e: Throwable => e }
      worker.complete(err)
    })
    t.start()
    Thread.sleep(3000) // let the job actually start
    val t0 = System.nanoTime()
    spark.sparkContext.cancelJobGroup("graft-repl")
    val err = worker.get(20, java.util.concurrent.TimeUnit.SECONDS)
    val cancelSec = (System.nanoTime() - t0) / 1e9
    assert(err != null, "cancelled collect must throw, not return")
    assert(cancelSec < 15, f"cancellation took $cancelSec%.1f s")
    // interruptOnCancel freed the task slots: the session answers a new
    // query promptly instead of queueing behind zombie sleeps
    val t1 = System.nanoTime()
    assert(spark.range(10).count() === 10)
    assert((System.nanoTime() - t1) / 1e9 < 15, "task slots still occupied")
  }
}
