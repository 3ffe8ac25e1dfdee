package graft

import graft.queries.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the inverted-index sparse-cosine join and the
  * curriculum staging pipeline.
  */
class SparseCosineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical docs score cosine ~1.0; disjoint docs never pair") {
    val text = (0 until 12).map(i => s"alpha$i").mkString(" ")
    val other = (0 until 12).map(i => s"beta$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text), (3L, other)).toDF("doc_id", "text")
    val rows = Similarity.sparseCosinePairsFrom(docs)
      .select("a_id", "b_id", "cos_e6").as[(Long, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).toSeq === Seq((1L, 2L)))
    // floor(1e6 * cos) of an exact self-pair is 1e6 or one ulp under
    assert(rows.head._3 >= 999999L && rows.head._3 <= 1000000L)
  }

  test("df cap drops corpus-wide boilerplate terms from the index") {
    // 200 docs sharing one long boilerplate tail; unique heads. The
    // tail trigrams have df=200 > cap, so no posting bucket holds them
    // and no pair forms (heads are disjoint).
    val tail = (0 until 10).map(i => s"common$i").mkString(" ")
    val docs = (0 until 200).map(i => (i.toLong, s"u${i}a u${i}b u${i}c $tail"))
      .toDF("doc_id", "text")
    assert(Similarity.sparseCosinePairsFrom(docs).count() === 0L)
  }

  test("weighting favors rare-term overlap over common-term overlap") {
    // Doc 1 = rare run + common run. Doc 2 = the rare run alone (df=2
    // trigrams, full weight); doc 3 = the common run alone, which also
    // appears in 20 background docs (df=22 -> weight 45 vs 500). Same
    // overlap SIZE both sides, but only the rare-overlap pair (1,2)
    // clears cos >= 0.5 — df weighting is what separates them.
    val rare = (1 to 8).map(i => s"zq$i").mkString(" ")
    val common = (1 to 8).map(i => s"cm$i").mkString(" ")
    val bg = (10 until 30).map(i => (i.toLong, s"pad${i}x pad${i}y $common"))
    val docs = (Seq(
      (1L, s"$rare $common"),
      (2L, rare),
      (3L, common)) ++ bg)
      .toDF("doc_id", "text")
    val got = Similarity.sparseCosinePairsFrom(docs)
      .select("a_id", "b_id", "cos_e6").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet === Set((1L, 2L)))
    assert(got((1L, 2L)) > 500000L)
  }

  test("curriculum stages partition every scored doc into 1..4") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("pipe_curriculum")(s, d)
      .select("lang", "stage", "n_docs", "min_score", "max_score")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.forall(r => r._2 >= 1 && r._2 <= 4))
    // stage score ranges are disjoint and ordered within a language
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(lo, hi) => assert(lo._5 <= hi._4,
          s"stage ${lo._2} max ${lo._5} must not exceed stage ${hi._2} min ${hi._4}")
        case _ =>
      }
    }
  }
}
