package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Exactness proof for duplicatedSpansFrom (Lee et al. maximal
  * duplicated-substring spans): the distributed rolling-fingerprint +
  * verify + span-merge pipeline must equal a brute-force
  * enumerate-every-window reference on planted corpora, and must be
  * partition-invariant.
  */
class SubstringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val L = 5

  /** Brute-force reference: mark every L-token window whose exact
    * content occurs >= 2 times corpus-wide, merge overlapping/adjacent
    * marked windows per doc into maximal spans.
    */
  private def bruteSpans(docs: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> "[^A-Za-z0-9]+".r.split(t).filter(_.nonEmpty).toSeq
    }
    val wins = toks.flatMap { case (id, ts) =>
      ts.sliding(L).zipWithIndex.collect {
        case (w, i) if w.size == L => (id, i.toLong, w.mkString(" "))
      }
    }
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val dup = wins.filter(w => counts(w._3) >= 2).map(w => (w._1, w._2))
    dup.groupBy(_._1).flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      val spans = scala.collection.mutable.ListBuffer[(Long, Long)]()
      for (p <- sorted) {
        if (spans.nonEmpty && p <= spans.last._2) {
          val (s0, _) = spans.remove(spans.size - 1)
          spans += ((s0, p + L))
        } else spans += ((p, p + L))
      }
      spans.map { case (s, e) => (id, s, e) }
    }.toSet
  }

  private def engineSpans(docs: Seq[(Long, String)], parts: Int) =
    Dedup.duplicatedSpansFrom(
        docs.toDF("doc_id", "text").repartition(parts), L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("matches brute force on a planted corpus (copies, partial overlaps)") {
    val shared = (0 until 12).map(i => s"s$i").mkString(" ") // 12 shared tokens
    val docs = Seq(
      1L -> s"a1 a2 a3 $shared b1 b2 b3",       // shared mid-doc
      2L -> s"$shared c1 c2 c3 c4 c5 c6 c7",    // shared at start
      3L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10",   // unique
      4L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10",   // exact copy of 3
      5L -> "x1 x2 x3 x4 x5 x6 x7 x8 x9",       // unique, no dup
      // within-doc repeat: the same 5-gram twice in ONE doc
      6L -> "r1 r2 r3 r4 r5 z1 z2 z3 r1 r2 r3 r4 r5")
    val exp = bruteSpans(docs)
    assert(exp.nonEmpty, "test corpus must produce spans")
    // sanity of the plant: docs 3/4 fully covered; doc 6 has two spans
    assert(exp.contains((3L, 0L, 10L)) && exp.contains((4L, 0L, 10L)))
    assert(exp.count(_._1 == 6L) == 2)
    assert(engineSpans(docs, 3) == exp)
  }

  test("spans are maximal: overlapping duplicated windows merge") {
    // doc 1 and 2 share a 9-token run -> 5 overlapping dup windows
    // that must merge into ONE span of 9 tokens, not 5 spans
    val run = "m1 m2 m3 m4 m5 m6 m7 m8 m9"
    val docs = Seq(1L -> s"p1 p2 $run q1 q2", 2L -> s"$run t1 t2 t3 t4")
    val out = engineSpans(docs, 2)
    assert(out == Set((1L, 2L, 11L), (2L, 0L, 9L)), out.toString)
  }

  test("result is partition-invariant") {
    val rnd = new scala.util.Random(11)
    val docs = (0 until 60).map { i =>
      i.toLong -> Seq.fill(30)(s"w${rnd.nextInt(40)}").mkString(" ")
    }
    assert(engineSpans(docs, 1) == engineSpans(docs, 7))
    assert(engineSpans(docs, 1) == bruteSpans(docs))
  }

  // ---- the CUT step (substrCutFrom) --------------------------------

  /** Brute-force cut reference: non-first duplicated window positions
    * (first = min packed (doc, pos)) merge into spans; covered tokens
    * are removed; returns (n_tokens, n_cut, cleaned string) per doc.
    */
  private def bruteCut(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> "[^a-z0-9]+".r.split(t.toLowerCase).filter(_.nonEmpty).toSeq
    }.toMap
    val wins = toks.toSeq.flatMap { case (id, ts) =>
      ts.sliding(L).zipWithIndex.collect {
        case (w, i) if w.size == L => (id, i.toLong, w.mkString(" "))
      }
    }
    val byWin = wins.groupBy(_._3).filter(_._2.size >= 2)
    val cutPos = byWin.values.flatMap { occ =>
      val firstK = occ.map(o => o._1 * (1L << 20) + o._2).min
      occ.filter(o => o._1 * (1L << 20) + o._2 != firstK)
    }.toSeq
    val cutByDoc = cutPos.groupBy(_._1).view.mapValues { ps =>
      // merged spans then expanded to covered positions
      val sorted = ps.map(_._2).sorted
      val spans = scala.collection.mutable.ListBuffer[(Long, Long)]()
      for (p <- sorted) {
        if (spans.nonEmpty && p <= spans.last._2) {
          val (s0, _) = spans.remove(spans.size - 1); spans += ((s0, p + L))
        } else spans += ((p, p + L))
      }
      spans.flatMap { case (s, e) => s until e }.toSet
    }.toMap
    toks.map { case (id, ts) =>
      val cut = cutByDoc.getOrElse(id, Set.empty)
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !cut.contains(i.toLong) => t
      }
      id -> ((ts.size.toLong, cut.size.toLong, kept.mkString(" ")))
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("cut removes exactly the non-first duplicated spans") {
    val run = (0 until 8).map(i => s"d$i").mkString(" ")
    val docs = Seq(
      1L -> s"a1 a2 $run a3 a4",                 // first occurrence: kept
      2L -> s"b1 $run b2 b3 b4",                 // second: span cut
      3L -> "u1 u2 u3 u4 u5 u6 u7",              // unique: untouched
      4L -> s"$run x1 $run")                     // within-doc repeat
    val exp = bruteCut(docs)
    // sanity of the plant: doc 1 keeps everything, doc 2 loses 8 tokens
    assert(exp(1L)._2 == 0L && exp(2L)._2 == 8L && exp(3L)._2 == 0L)
    val out = Dedup.substrCutFrom(docs.toDF("doc_id", "text").repartition(3), L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out.keySet == exp.keySet)
    for ((id, (n, cut, cleaned)) <- exp)
      assert(out(id) == ((n, cut, md5hex(cleaned))),
        s"doc $id: ${out(id)} vs ($n, $cut, ${md5hex(cleaned)} [$cleaned])")
  }
}
