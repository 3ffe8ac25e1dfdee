package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnicodeNorm

/** Pins [[graft.functions.NfcNormalize]] (`graft_nfc`):
  * canonical-equivalence collapse, the zero-allocation fast path on
  * already-NFC input, null propagation, and agreement with an
  * out-of-band `java.text.Normalizer` reference over generated
  * mixed-form strings (the codegen path is what the Dataset run
  * exercises; eval-vs-codegen divergence would fail these).
  */
class UnicodeNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def nfcOf(xs: Seq[String]): Seq[String] = {
    import spark.implicits._
    xs.toDF("s")
      .select(UnicodeNorm.nfc(spark, col("s")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("decomposed and precomposed forms normalize to identical bytes") {
    // e + U+0301 vs U+00E9; u + U+0308 vs U+00FC; A + U+030A vs U+00C5
    val dec = Seq("Café", "über", "Ångström")
    val pre = Seq("Café", "über", "Ångström")
    assert(nfcOf(dec) == pre)
    assert(nfcOf(pre) == pre) // precomposed is already NFC — identity
  }

  test("matches java.text.Normalizer over random mixed-form strings") {
    val rnd = new scala.util.Random(7)
    val parts = Array("é", "é", "ö", "ö", "ascii",
      "́", "x", " ", "ガ", "ガ") // incl. katakana voicing
    val strs = Seq.fill(64)(
      Seq.fill(1 + rnd.nextInt(6))(parts(rnd.nextInt(parts.length))).mkString)
    val expected = strs.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(nfcOf(strs) == expected)
  }

  test("already-NFC input returns the input object (no allocation)") {
    val s = UTF8String.fromString("plain ascii is structurally NFC")
    assert(UnicodeNorm.nfc(s) eq s)
    val composed = UTF8String.fromString("Café")
    assert(UnicodeNorm.nfc(composed) eq composed)
  }

  test("null propagates, empty string is identity") {
    assert(nfcOf(Seq(null, "")) == Seq(null, ""))
  }
}
