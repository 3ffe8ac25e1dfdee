package graft

import graft.functions.Vectors
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions wiring: functions resolvable from SQL on an
  * extensions-built session, and the SimplifySelfCosine rule folds the
  * self-similarity diagonal to a literal.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // Separate session config; shares the JVM-wide SparkContext.
    Engine.builder("local[4]", 4)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
      .newSession()
  }

  test("extension-registered functions callable from SQL") {
    // newSession() keeps extensions; register on this session anyway to
    // cover both wiring paths.
    Vectors.register(spark)
    graft.functions.TokenizeExplode.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS c").collect()
    assert(r.head.getDouble(0) == 0.0)
    val t = spark.sql(
      "SELECT graft_tokenize('a_b 42') AS w").collect().map(_.getString(0))
    assert(t.toSeq == Seq("a", "b", "42"))
  }

  test("sketch aggregates callable from SQL via extensions") {
    graft.functions.KmvDistinct.register(spark)
    graft.functions.HllDistinct.register(spark)
    spark.range(0, 1000, 1, 4).createOrReplaceTempView("ext_ids")
    val r = spark.sql("""
      SELECT graft_hll_distinct(CAST(id AS STRING)) AS h,
             graft_kmv_distinct(CAST(id AS STRING), 16) AS k
      FROM ext_ids""").collect().head
    assert(math.abs(r.getLong(0) - 1000L) < 30)
    assert(r.getDouble(1) > 500.0) // KMV estimate in a sane band
  }

  test("sketch aggregates reject non-string args at analysis time") {
    graft.functions.KmvDistinct.register(spark)
    graft.functions.HllDistinct.register(spark)
    spark.range(0, 10).createOrReplaceTempView("ext_ids_typed")
    for (fn <- Seq("graft_hll_distinct(id)", "graft_kmv_distinct(id, 16)")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $fn FROM ext_ids_typed").collect()
      }
      assert(e.getMessage.toLowerCase.contains("string"), e.getMessage)
    }
  }

  test("SimplifySelfCosine folds cosine(x, x) to 1.0 in the plan") {
    Vectors.register(spark)
    val v = array(lit(3.0f), lit(4.0f)) // non-nullable child
    val df = spark.range(1).select(Vectors.cosine(spark, v, v).as("c"))
    assert(df.collect().head.getDouble(0) == 1.0)
    val rewritten = SimplifySelfCosine(df.queryExecution.analyzed)
    assert(!rewritten.toString.contains("graft_cosine"),
      s"rule did not fold: $rewritten")
  }
}
