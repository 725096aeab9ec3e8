package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{ComposeTimestamp, MonthNum}

/** The arithmetic timestamp compose and month lookup replaced
  * `try_make_timestamp` + a 12-arm CASE chain on the hot parse path —
  * these specs pin bit-parity against the replaced formulations over
  * randomized valid AND invalid inputs (UTC session). */
class ComposeTimestampSpec extends SparkSpec {
  import spark.implicits._

  test("ComposeTimestamp matches try_make_timestamp on random valid and invalid parts") {
    val rnd = new scala.util.Random(7)
    // valid dates, invalid months/days/hours/minutes/seconds, leap and
    // non-leap Februaries, century boundaries (1900 not leap, 2000 leap)
    // seconds drawn from [-1, 59] ∪ {61}: exactly 60 is excluded because
    // Spark's make_timestamp interprets it as a LEAP SECOND and rolls to
    // the next minute, while this expression (like the reference's
    // chrono ymd_hms, src/data_model.rs:249-308) rejects it — asserted
    // separately below as a documented divergence from the Spark builtin.
    def sec(): Int = { val s = rnd.nextInt(62) - 1; if (s == 60) 61 else s }
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(10000), 1 + rnd.nextInt(14) - 1, 1 + rnd.nextInt(33) - 1,
        rnd.nextInt(26) - 1, rnd.nextInt(62) - 1, sec())
    } ++ Seq(
      (2000, 2, 29, 0, 0, 0), (1900, 2, 29, 0, 0, 0), (2024, 2, 29, 23, 59, 59),
      (2023, 2, 29, 0, 0, 0), (9999, 12, 31, 23, 59, 59), (1, 1, 1, 0, 0, 0),
      // year 0 is valid proleptic Gregorian (chrono parity; it's a leap
      // year — divisible by 400) — a "0000" capture must compose
      (0, 1, 1, 0, 0, 0), (0, 2, 29, 12, 30, 30), (0, 12, 31, 23, 59, 59),
      (2024, 4, 31, 1, 1, 1), (2024, 0, 1, 0, 0, 0), (2024, 13, 1, 0, 0, 0))
    val df = rows.toDF("y", "mo", "d", "h", "mi", "s")
    val both = df.select(
      ComposeTimestamp(col("y"), col("mo"), col("d"), col("h"), col("mi"),
        col("s").cast(LongType) * 1000000L).as("fast"),
      try_make_timestamp(col("y"), col("mo"), col("d"), col("h"), col("mi"),
        col("s").cast(DecimalType(16, 6))).as("slow"))
    val diff = both.filter(not(col("fast") <=> col("slow"))).count()
    assert(diff === 0, both.filter(not(col("fast") <=> col("slow"))).head(3).mkString("; "))
    // the one deliberate divergence: second == 60 is NULL here (chrono
    // parity), where Spark's builtin leap-second-rolls to the next minute
    val leap = Seq((2024, 6, 17, 7, 7, 60)).toDF("y", "mo", "d", "h", "mi", "s")
      .select(ComposeTimestamp(col("y"), col("mo"), col("d"), col("h"), col("mi"),
        col("s").cast(LongType) * 1000000L).as("ts"))
    assert(leap.head().isNullAt(0))
  }

  test("ComposeTimestamp carries fraction micros exactly") {
    val df = Seq((2024, 6, 17, 7, 7, 3, 123456L)).toDF("y", "mo", "d", "h", "mi", "s", "us")
    val got = df.select(ComposeTimestamp(col("y"), col("mo"), col("d"), col("h"),
        col("mi"), col("s").cast(LongType) * 1000000L + col("us")).as("ts"))
      .select(unix_micros(col("ts"))).as[Long].head()
    assert(got % 1000000L === 123456L)
    assert(got === 1718608023123456L) // 2024-06-17T07:07:03.123456Z
  }

  test("MonthNum matches the reference's exact token set (whole string, lowercased)") {
    // reference src/data_model.rs:281-295 — 3-letter names plus long
    // forms june/july/sept, matched against the WHOLE lowercased capture;
    // anything else (including full names like "January") is Null
    val names = Seq("jan", "feb", "mar", "apr", "may", "jun",
      "jul", "aug", "sep", "oct", "nov", "dec")
    val hits: Seq[(String, Int)] =
      names.zipWithIndex.map { case (n, i) => (n, i + 1) } ++
      names.zipWithIndex.map { case (n, i) => (n.capitalize, i + 1) } ++
      names.zipWithIndex.map { case (n, i) => (n.toUpperCase, i + 1) } ++
      Seq(("june", 6), ("July", 7), ("SEPT", 9), ("sEpT", 9))
    val misses = Seq("January", "decEMBER", "ju", "", "0", "13", "Janx",
      "xan", "mAy ", " may", "junee", "sep.", "août")
    val df = (hits.map { case (s, m) => (s, Some(m)) } ++
      misses.map(s => (s, Option.empty[Int]))).toDF("m", "want")
    val diff = df.select(MonthNum(col("m")).as("got"), col("want"))
      .filter(not(col("got") <=> col("want"))).count()
    assert(diff === 0)
  }
}
