package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-DETERMINISTIC natural log for oracle-gated queries.
  *
  * `ln()` is the one operation in the repo's fixed-point discipline
  * that was still transcendental: JVM `Math.log` and DuckDB's libm
  * `log` may differ in the last ulp, and a 1-ulp difference landing
  * within ~1e-6 of a rounding boundary flips an integer-scaled key by
  * 1 (the ADVICE-flagged flake in pipe_sample_weighted / txt_bm25).
  *
  * This ln is built ONLY from operations IEEE 754 requires to be
  * correctly rounded — double `+ - * /` — plus exact integer range
  * reduction, so Spark and DuckDB produce BIT-IDENTICAL doubles:
  *
  *   x >= 1:  m  = floor(x)            (exact)
  *            e  = bitlength(m) - 1    (exact; `bin()` both engines)
  *            y  = x / 2^e  in [1,2)   (power-of-2 divide: exact)
  *            z  = (y-1)/(y+1) in [0,1/3)
  *            ln(x) = e*ln2 + 2z*(1 + z^2/3 + z^4/5 + ... + z^24/25)
  *
  * The atanh tail at z < 1/3 through z^25 gives < 6e-16 relative
  * error (measured: max 5.7e-16 over 200k random points) — an honest
  * ln to within a hair of correctly rounded, and the SAME hair on
  * both engines because every step rounds identically. [[DetMathSpec]]
  * pins the JVM output bits against DuckDB-computed hex values.
  *
  * [[lnColumn]] builds the Spark expression; the `*Sql` helpers build
  * the DuckDB mirror from the SAME coefficient list, with constants
  * rendered as `'<shortest-roundtrip>'::DOUBLE` string casts (a bare
  * SQL decimal literal is DECIMAL, whose →DOUBLE cast path is not
  * guaranteed to match a correctly-rounded string parse).
  */
object DetMath {
  /** ln 2, correctly rounded (shortest round-trip repr). */
  val LN2: Double = 0.6931471805599453

  /** Horner tail coefficients 1/3, 1/5, ..., 1/25 (exact-compile-time
    * correctly-rounded divisions; DuckDB re-derives the identical
    * doubles from the shortest-round-trip string parse).
    */
  private val coefs: Seq[Double] = (3 to 25 by 2).map(d => 1.0 / d)

  private def dlit(d: Double): String = s"'${d.toString}'::DOUBLE"

  /** Deterministic ln of a double column with x >= 1. For an x below 1
    * expressible as m / 2^k with integer m (e.g. a 48-bit uniform),
    * use `lnColumn(m) - k * LN2` — see pipe_sample_weighted.
    */
  def lnColumn(x: Column): Column = {
    val m = floor(x).cast("long")
    val e = length(bin(m)) - lit(1)
    val y = x / call_function("shiftleft", lit(1L), e).cast("double")
    val z = (y - lit(1.0)) / (y + lit(1.0))
    val z2 = z * z
    val s = coefs.reverse.tail.foldLeft(lit(coefs.last)) {
      (acc, c) => lit(c) + z2 * acc
    }
    e.cast("double") * lit(LN2) + lit(2.0) * z * (lit(1.0) + z2 * s)
  }

  /** SQL staging fragments: e / y / z from an x >= 1 expression. The
    * caller names them as subquery columns (keeps the oracle readable
    * and evaluates each stage once, like Catalyst's subexpr elim).
    */
  def eSql(x: String): String = s"(length(bin(floor($x)::BIGINT)) - 1)"
  def ySql(x: String, e: String): String =
    s"($x / ((1::BIGINT << $e)::DOUBLE))"
  def zSql(y: String): String =
    s"(($y - ${dlit(1.0)}) / ($y + ${dlit(1.0)}))"

  /** Final SQL arithmetic from named e / z / z2 columns — the exact
    * operation-for-operation mirror of [[lnColumn]]'s tree.
    */
  def lnSqlFromParts(e: String, z: String, z2: String): String = {
    val s = coefs.reverse.tail.foldLeft(dlit(coefs.last)) {
      (acc, c) => s"(${dlit(c)} + ($z2 * $acc))"
    }
    s"(($e::DOUBLE * ${dlit(LN2)}) + " +
      s"((${dlit(2.0)} * $z) * (${dlit(1.0)} + ($z2 * $s))))"
  }
}
