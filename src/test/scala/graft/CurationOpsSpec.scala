package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 curation operators: winnowing's detection guarantee and
  * density bound, Gopher rule thresholds at their boundaries, the
  * salted join's value-equivalence + plan shape, and binary dedup
  * grouping. Cross-engine value checks live in the driver gate; these
  * pin the algorithmic properties the gate can't express.
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docsDF(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("winnowing guarantees a shared fingerprint for any shared 6-token run") {
    // k=3, w=4: any common substring of k+w-1 = 6 tokens must yield at
    // least one common selected fingerprint (Schleimer et al. Thm. 2).
    val common = "alpha bravo charlie delta echo foxtrot"
    val a = docsDF(
      1L -> s"one two three four five six seven $common eight nine ten eleven twelve",
      2L -> s"red orange yellow green blue $common indigo violet pink brown black white")
    val fps = graft.queries.TextAnalysis.winnowFrom(a)
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty,
      s"no shared fingerprint: ${fps(1L)} vs ${fps(2L)}")
  }

  test("winnowing emits nothing under 6 tokens and bounded density above") {
    val d = docsDF(
      1L -> "one two three four five",                  // 5 tokens: nothing
      2L -> "one two three four five six",              // exactly one window
      3L -> ("tok " * 100).trim)                        // 100 identical tokens
    val by = graft.queries.TextAnalysis.winnowFrom(d)
      .collect().groupBy(_.getLong(0))
    assert(!by.contains(1L))
    assert(by(2L).length == 1)
    // 100 equal tokens -> every gram hash equal -> exactly 1 distinct fp;
    // density can never exceed the window count (n - 5 windows)
    assert(by(3L).length == 1)
  }

  test("gopher rules flip at their documented boundaries") {
    val w49 = (1 to 49).map(i => s"word$i").mkString(" ") + " the a"
    val w50 = (1 to 48).map(i => s"word$i").mkString(" ") + " the a"
    val shortWords = (1 to 50).map(_ => "ab").mkString(" ") + " the a" // mwl < 3
    val numeric = (1 to 52).map(i => s"$i").mkString(" ")              // no alpha
    val w49only = (1 to 47).map(i => s"word$i").mkString(" ") + " the a"
    val d = docsDF(1L -> w49, 2L -> w50, 3L -> shortWords, 4L -> numeric,
      5L -> w49only)
    val rows = graft.queries.TextAnalysis.gopherFrom(d)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_tokens") == 51 &&
      rows(1L).getAs[Boolean]("gopher_pass")) // 51 in [50, 100k]
    assert(rows(2L).getAs[Long]("n_tokens") == 50 &&
      rows(2L).getAs[Boolean]("gopher_pass")) // boundary inclusive
    assert(!rows(3L).getAs[Boolean]("r_meanwordlen") &&
      !rows(3L).getAs[Boolean]("gopher_pass"))
    assert(!rows(4L).getAs[Boolean]("r_alphafrac") &&
      !rows(4L).getAs[Boolean]("r_stopwords") &&
      !rows(4L).getAs[Boolean]("gopher_pass"))
    assert(rows(5L).getAs[Long]("n_tokens") == 49 &&
      !rows(5L).getAs[Boolean]("r_wordcount") &&
      !rows(5L).getAs[Boolean]("gopher_pass")) // one under the floor
  }

  test("salted join: values equal the plain join, plan avoids broadcast") {
    val q = SparkEntry.queries("q_salted_join")(spark, TestSpark.sf0001)
    val plain = Tables.lineitem(spark, TestSpark.sf0001)
      .join(Tables.supplier(spark, TestSpark.sf0001),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0)
          .as("total_price"))
      .orderBy("s_nationkey")
    assert(q.collect().toSeq == plain.collect().toSeq)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin"),
      s"salt is a no-op under broadcast; expected a shuffled join:\n$p")
  }

  test("winnow pairs: boilerplate fingerprints die under the MAX_BLOCK cap") {
    // 70 identical docs (> MAX_BLOCK = 64): every fingerprint block is
    // over the cap, so NO pairs emerge — the hot-block guard that keeps
    // a boilerplate-heavy corpus from going quadratic. Two other docs
    // sharing a distinct passage still pair normally.
    val boiler = (1 to 20).map(i => s"common$i").mkString(" ")
    // 24 shared tokens: >= 3 guaranteed shared fingerprints (one per
    // disjoint 6-token stretch), clearing the n_shared >= 3 threshold
    val shared = (1 to 24).map(i => s"passage$i").mkString(" ")
    val rows = (1L to 70L).map(i => i -> boiler) ++ Seq(
      100L -> s"unique one two three $shared",
      101L -> s"other four five six seven $shared")
    val pairs = graft.queries.Dedup.winnowPairsFrom(docsDF(rows: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((100L, 101L)),
      s"expected only the non-boilerplate pair, got: ${pairs.toSeq}")
  }

  test("phash: identical payloads collide, a localized edit stays within a few bits") {
    import spark.implicits._
    def rec(id: Long, text: String) =
      graft.operators.MediaRecord(id, "image", text.getBytes("UTF-8"))
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val edited = base.updated(10, 'X').updated(11, 'Y') // 2-byte local edit
    val ds = Seq(rec(1, base), rec(2, base), rec(3, edited)).toDS()
    val h = graft.operators.MultimodalOps.phash(ds)
      .collect().map(p => p.doc_id -> p.phash).toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <= 6,
      s"local edit moved ${java.lang.Long.bitCount(h(1L) ^ h(3L))} bits")
    assert((0 to 59).forall(b => (h(1L) >>> 60) == 0), "must stay in 60 bits")
  }

  test("mm_dedup groups re-ingested payloads under one representative") {
    val rows = SparkEntry.queries("mm_dedup")(spark, TestSpark.sf0001).collect()
    val byCopies = rows.groupBy(_.getAs[Long]("n_copies"))
    // every 7th doc_id was re-ingested: those groups have 2 copies
    assert(byCopies.keySet == Set(1L, 2L))
    assert(byCopies(2L).forall(_.getAs[Long]("rep_id") % 7 == 0))
    // representatives are always the original ingest, never the replay
    assert(rows.forall(_.getAs[Long]("rep_id") < 100000))
  }
}
