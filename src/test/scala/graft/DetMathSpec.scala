package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bit-level pin of [[graft.functions.DetMath.lnColumn]] against
  * DuckDB: the expected hex doubles below were computed BY DUCKDB
  * running the exact SQL `lnSqlFromParts` generates (same staging, same
  * Horner tree). Equality here is the cross-engine determinism claim
  * itself — every op in the chain is IEEE-correctly-rounded `+ - * /`
  * plus exact integer range reduction, so JVM and libm never diverge.
  */
class DetMathSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (x, DuckDB-computed float.hex() of lnDet(x)) */
  private val duckdbPins: Seq[(Double, String)] = Seq(
    1.0 -> "0x0.0p+0",
    1.5 -> "0x1.9f323ecbf984cp-2",
    2.0 -> "0x1.62e42fefa39efp-1",
    3.0 -> "0x1.193ea7aad030ap+0",
    7.0 -> "0x1.f2272ae325a57p+0",
    1000.5 -> "0x1.ba20da39bd287p+2",
    2.5e6 -> "0x1.d76aea89e0da8p+3",
    123456789.0 -> "0x1.2a1a38bd05409p+4",
    281474976710656.0 -> "0x1.0a2b23f3bab73p+5")

  private def lnDetOf(xs: Seq[Double]): Seq[Double] = {
    import spark.implicits._
    xs.toDF("x")
      .select(graft.functions.DetMath.lnColumn(col("x")).as("v"))
      .collect().map(_.getDouble(0)).toSeq
  }

  test("lnColumn bit-matches DuckDB's evaluation of the generated SQL") {
    val got = lnDetOf(duckdbPins.map(_._1))
    duckdbPins.zip(got).foreach { case ((x, hex), v) =>
      val expected = java.lang.Double.parseDouble(hex)
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(expected),
        s"lnDet($x): got ${java.lang.Double.toHexString(v)}, DuckDB $hex")
    }
  }

  test("lnColumn is an honest ln: < 4e-15 relative error on a sweep") {
    val rnd = new scala.util.Random(7)
    val xs = (1 to 2000).map(_ => 1.0 + rnd.nextDouble() * 2.814e14)
    val got = lnDetOf(xs)
    xs.zip(got).foreach { case (x, v) =>
      val err = math.abs(v - math.log(x)) / math.max(math.log(x), 1e-300)
      assert(err < 4e-15, s"lnDet($x)=$v vs Math.log=${math.log(x)}")
    }
  }

  test("lnColumn covers the full 48-bit-uniform domain edge cases") {
    // m = 1 (ln 0-adjacent after the -48ln2 shift) and m = 2^48
    val got = lnDetOf(Seq(1.0, 2.0, 281474976710656.0))
    assert(got.head == 0.0)
    assert(math.abs(got(1) - math.log(2.0)) < 1e-15)
    assert(math.abs(got(2) - 48 * math.log(2.0)) < 1e-12)
  }
}
