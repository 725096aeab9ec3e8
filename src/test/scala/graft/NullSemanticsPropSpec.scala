package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.NullSemantics

/** Property-based parity for the reference's null semantics
  * (SURVEY §7.4 risk register): comparisons yield FALSE (never NULL)
  * when either side is NULL (`expression_execution.rs:60-70`), IS/IS NOT
  * are total (`:73-81`), AND/OR coerce NULL operands to false. The
  * oracle is a plain Scala model over randomly generated nullable
  * operand pairs (fixed seed — deterministic); both sides evaluate over
  * ONE DataFrame pass per run, not one Spark job per case. */
class NullSemanticsPropSpec extends SparkSpec {
  import spark.implicits._

  private val N = 500
  private val pairGen: Gen[(Option[Long], Option[Long])] = {
    val v = Gen.frequency(
      3 -> Gen.choose(-5L, 5L).map(Some(_)),
      1 -> Gen.const(None))
    Gen.zip(v, v)
  }
  private lazy val pairs: Seq[(Option[Long], Option[Long])] =
    Gen.listOfN(N, pairGen).apply(Gen.Parameters.default, Seed(42L)).get

  private lazy val df = pairs.toDF("l", "r").cache()

  private def check(name: String,
      sparkSide: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      model: (Option[Long], Option[Long]) => Boolean): Unit = {
    val got = df.select(NullSemantics.boolOf(sparkSide(col("l"), col("r"))))
      .as[Boolean].collect().toSeq
    val want = pairs.map { case (l, r) => model(l, r) }
    assert(got === want, s"$name diverges from the reference model")
  }

  test("comparisons are false-on-null for every generated operand pair") {
    check("lt", _ < _, (l, r) => l.zip(r).exists { case (a, b) => a < b })
    check("le", _ <= _, (l, r) => l.zip(r).exists { case (a, b) => a <= b })
    check("gt", _ > _, (l, r) => l.zip(r).exists { case (a, b) => a > b })
    check("ge", _ >= _, (l, r) => l.zip(r).exists { case (a, b) => a >= b })
    check("eq", _ === _, (l, r) => l.zip(r).exists { case (a, b) => a == b })
    check("ne", _ =!= _, (l, r) => l.zip(r).exists { case (a, b) => a != b })
  }

  test("IS / IS NOT are total: NULL IS NULL true, NULL IS x false") {
    val got = df.select(NullSemantics.is(col("l"), col("r")),
        NullSemantics.isNot(col("l"), col("r")))
      .as[(Boolean, Boolean)].collect().toSeq
    val want = pairs.map { case (l, r) => (l == r, l != r) }
    assert(got === want)
  }

  test("AND/OR coerce NULL operands to false (boolOf at projection boundary)") {
    val cmpL = col("l") > 0L // NULL when l NULL under Spark 3VL
    val cmpR = col("r") > 0L
    val got = df.select(
        NullSemantics.boolOf(NullSemantics.boolOf(cmpL) && NullSemantics.boolOf(cmpR)),
        NullSemantics.boolOf(NullSemantics.boolOf(cmpL) || NullSemantics.boolOf(cmpR)))
      .as[(Boolean, Boolean)].collect().toSeq
    val want = pairs.map { case (l, r) =>
      val a = l.exists(_ > 0L); val b = r.exists(_ > 0L)
      (a && b, a || b)
    }
    assert(got === want)
  }
}
