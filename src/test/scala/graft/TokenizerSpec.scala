package graft

import graft.functions.Text
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: Text.tokens must agree with a 3-line Scala oracle
  * (SURVEY §5.2.3b) for arbitrary inputs, including high bytes.
  */
class TokenizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** In-memory oracle: the reference tokenizer in idiomatic Scala. */
  private def oracle(s: String): Seq[String] =
    "[A-Za-z0-9]+".r.findAllIn(s).toSeq

  private def sparkTokens(inputs: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    inputs.toDF("value")
      .select(Text.tokens(col("value")).as("t"))
      .as[Seq[String]].collect().toSeq
  }

  test("tokens match oracle on crafted edge cases") {
    val cases = Seq(
      "", " ", "a", "a b", "_a_b_", "42abc C3PO", "café",
      "tab\tsep\nnl", "ALL1caps2", "a" * 1000, "ÿxé",
      "1 22 333", "..,,;;", "x", "Mixed_Case-Words.Here")
    assert(sparkTokens(cases) == cases.map(oracle))
  }

  test("property: tokens match oracle on random strings incl. high chars") {
    val charGen = Gen.frequency(
      (5, Gen.alphaNumChar),
      (2, Gen.oneOf(' ', '\t', '\n', '_', '.', ',', '-')),
      (1, Gen.choose(0x80.toChar, 0x2FFF.toChar)))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    // Batch: collect 50 random strings, compare in one Spark job.
    val samples = Gen.listOfN(50, strGen).sample.get
    assert(sparkTokens(samples) == samples.map(oracle))
  }

  test("property: TokenizeExplode generator matches regex oracle") {
    import spark.implicits._
    val charGen = Gen.frequency(
      (5, Gen.alphaNumChar),
      (2, Gen.oneOf(' ', '\t', '\n', '_', '.', ',', '-')),
      (1, Gen.choose(0x80.toChar, 0x2FFF.toChar)))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val samples = Gen.listOfN(40, strGen).sample.get.zipWithIndex
    val df = samples.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = df.select(col("id"),
        graft.functions.TokenizeExplode.tokenize(spark, col("s")).as("w"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val want = samples.map { case (s, i) => i.toLong -> oracle(s) }
      .filter(_._2.nonEmpty).toMap
    assert(got == want)
  }

  test("property: sum of counts equals token count; keys ascending") {
    val docs = Seq("a b a c b a", "x y", "", "a A 1 10 9")
    import spark.implicits._
    val counts = graft.operators.WordCount.counts(docs.toDF("value"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(counts.map(_._2).sum == docs.map(oracle(_).size).sum)
    val keys = counts.map(_._1)
    assert(keys == keys.sorted)
  }

  test("ngrams and charShingles") {
    import spark.implicits._
    val df = Seq("a b c d").toDF("t").select(
      Text.ngrams(Text.tokens(col("t")), 2).as("bi"),
      Text.charShingles(lit("abcd"), 3).as("sh"))
    val r = df.as[(Seq[String], Seq[String])].collect().head
    assert(r._1 == Seq("a b", "b c", "c d"))
    assert(r._2 == Seq("abc", "bcd"))
    val short = Seq("a").toDF("t").select(
      Text.ngrams(Text.tokens(col("t")), 2).as("bi"),
      Text.charShingles(lit("ab"), 3).as("sh"))
      .as[(Seq[String], Seq[String])].collect().head
    assert(short._1.isEmpty && short._2.isEmpty)
  }

  test("ChunkExplode: window/stride/tail rule") {
    import spark.implicits._
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val rows = Seq(text).toDF("t")
      .select(graft.functions.ChunkExplode.chunks(spark, col("t"), 8, 4)
        .as(Seq("idx", "chunk", "n")))
      .as[(Int, String, Int)].collect().toSeq
    // 10 tokens, width 8, stride 4: windows at 0 (8 toks) and 4 (6 toks);
    // no third window (it would be contained in the second)
    assert(rows === Seq(
      (0, (1 to 8).map("t" + _).mkString(" "), 8),
      (1, (5 to 10).map("t" + _).mkString(" "), 6)))
    // short doc: single whole-doc chunk
    val one = Seq("a b c").toDF("t")
      .select(graft.functions.ChunkExplode.chunks(spark, col("t"), 8, 4)
        .as(Seq("idx", "chunk", "n")))
      .as[(Int, String, Int)].collect().toSeq
    assert(one === Seq((0, "a b c", 3)))
  }
}
