package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** AsofJoin property: the union-tag windowed formulation must equal a
  * brute-force in-memory oracle (latest right.ts <= left.ts per key)
  * on randomized inputs, including ties and keys with no matches.
  */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def oracle(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)])
      : Map[Long, Option[Long]] =
    left.map { case (id, k, ts) =>
      val candidates = right.filter(r => r._2 == k && r._3 <= ts)
      id -> (if (candidates.isEmpty) None
             else Some(candidates.maxBy(r => (r._3, r._1))._1))
    }.toMap

  test("asofBackward matches brute-force oracle on random data") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(1, 60)
      nr <- Gen.choose(0, 60)
      lts <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
      rts <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
    } yield (lts, rts)
    for (seed <- 1 to 5) {
      val (lraw, rraw) = gen.sample.get
      val left = lraw.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
      // unique (key, ts) on the right so the oracle's pick is unambiguous
      val right = rraw.distinctBy(r => (r._1, r._2)).zipWithIndex
        .map { case ((k, ts), i) => (1000L + i, k, ts) }
      val ldf = left.toDF("id", "k", "ts")
      val rdf = right.toDF("rid", "k", "ts")
      val got = AsofJoin.asofBackward(ldf, rdf, "k", "ts",
        payload = Seq("rid"), rename = Map("rid" -> "matched"))
        .select(col("id"), col("matched"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got == oracle(left, right), s"seed=$seed left=$left right=$right")
    }
  }

  private def oracleFwd(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)])
      : Map[Long, Option[Long]] =
    left.map { case (id, k, ts) =>
      val candidates = right.filter(r => r._2 == k && r._3 >= ts)
      id -> (if (candidates.isEmpty) None
             else Some(candidates.minBy(r => (r._3, r._1))._1))
    }.toMap

  test("asofForward matches brute-force oracle on random data") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(1, 60)
      nr <- Gen.choose(0, 60)
      lts <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
      rts <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
    } yield (lts, rts)
    for (seed <- 1 to 5) {
      val (lraw, rraw) = gen.sample.get
      val left = lraw.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
      val right = rraw.distinctBy(r => (r._1, r._2)).zipWithIndex
        .map { case ((k, ts), i) => (1000L + i, k, ts) }
      val got = AsofJoin.asofForward(left.toDF("id", "k", "ts"),
        right.toDF("rid", "k", "ts"), "k", "ts",
        payload = Seq("rid"), rename = Map("rid" -> "matched"))
        .select(col("id"), col("matched"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got == oracleFwd(left, right), s"seed=$seed left=$left right=$right")
    }
  }

  test("asofBackwardWithin nulls matches older than the tolerance") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L), (2L, 1L, 30L), (3L, 2L, 100L)).toDF("id", "k", "ts")
    val right = Seq((10L, 1L, 20L), (20L, 2L, 95L)).toDF("rid", "k", "ts")
    val got = AsofJoin.asofBackwardWithin(left, right, "k", "ts",
      payload = Seq("rid"), rename = Map("rid" -> "matched"), toleranceUs = 10L)
      .select(col("id"), col("matched")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // id=1: match at ts=20 is 80 behind -> nulled; id=2: 10 behind -> kept
    // id=3: 5 behind -> kept
    assert(got == Map(1L -> None, 2L -> Some(10L), 3L -> Some(20L)))
  }

  private def oracleNearest(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long)]): Map[Long, Option[Long]] =
    left.map { case (id, k, ts) =>
      // unique (key, ts) right rows make each leg's pick unambiguous
      val back = right.filter(r => r._2 == k && r._3 <= ts)
        .sortBy(r => -r._3).headOption
      val fwd = right.filter(r => r._2 == k && r._3 >= ts)
        .sortBy(r => r._3).headOption
      id -> ((back, fwd) match {
        case (None, None) => None
        case (Some(b), None) => Some(b._1)
        case (None, Some(f)) => Some(f._1)
        case (Some(b), Some(f)) => // tie -> backward
          if (ts - b._3 <= f._3 - ts) Some(b._1) else Some(f._1)
      })
    }.toMap

  test("asofNearest matches brute-force oracle on random data") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(1, 60)
      nr <- Gen.choose(0, 60)
      lts <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
      rts <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
    } yield (lts, rts)
    for (seed <- 1 to 5) {
      val (lraw, rraw) = gen.sample.get
      val left = lraw.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) }
      val right = rraw.distinctBy(r => (r._1, r._2)).zipWithIndex
        .map { case ((k, ts), i) => (1000L + i, k, ts) }
      val got = AsofJoin.asofNearest(left.toDF("id", "k", "ts"),
        right.toDF("rid", "k", "ts"), "k", "ts", leftId = "id",
        payload = Seq("rid"), rename = Map("rid" -> "matched"))
        .select(col("id"), col("matched"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got == oracleNearest(left, right), s"seed=$seed left=$left right=$right")
    }
  }
}
