package graft

import graft.functions.{ArraySets, SortedIntersectCount, SortedIntersectLongs}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property gate for the codegen'd two-pointer merge behind PPJoin's
  * exact-verify leg (`graft_sorted_intersect_count`): both the
  * interpreted `eval` path and the WholeStageCodegen path must agree
  * with the set-theoretic oracle `|A ∩ B|` on sorted distinct input,
  * and null elements (legal through the SQL registration) must be
  * skipped, never counted, on both paths.
  */
class ArraySetsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val longSets: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)
  private val strSets: Gen[Seq[String]] =
    Gen.listOf(Gen.oneOf(Gen.alphaLowerStr.map(_.take(4)),
      Gen.oneOf("", "é", "ÿx", "0", "Z")))
      .map(_.distinct.sorted)

  private def evalLong(a: Seq[Long], b: Seq[Long]): Long =
    SortedIntersectCount(
      Literal.create(a, ArrayType(LongType, containsNull = false)),
      Literal.create(b, ArrayType(LongType, containsNull = false)))
      .eval(InternalRow.empty).asInstanceOf[Long]

  test("property: interpreted eval matches |A ∩ B| on sorted long sets") {
    Gen.listOfN(200, Gen.zip(longSets, longSets)).sample.get.foreach {
      case (a, b) =>
        assert(evalLong(a, b) == a.toSet.intersect(b.toSet).size.toLong,
          s"a=$a b=$b")
    }
  }

  test("property: codegen path matches |A ∩ B| on sorted long + string sets") {
    import spark.implicits._
    val cases = Gen.listOfN(60, Gen.zip(longSets, longSets)).sample.get
    val df = cases.toDF("a", "b")
      .select(ArraySets.sortedIntersectCount(spark, col("a"), col("b")).as("c"))
    assert(df.as[Long].collect().toSeq ==
      cases.map { case (a, b) => a.toSet.intersect(b.toSet).size.toLong })

    val sCases = Gen.listOfN(60, Gen.zip(strSets, strSets)).sample.get
    val sdf = sCases.toDF("a", "b")
      .select(ArraySets.sortedIntersectCount(spark, col("a"), col("b")).as("c"))
    assert(sdf.as[Long].collect().toSeq ==
      sCases.map { case (a, b) => a.toSet.intersect(b.toSet).size.toLong })
  }

  test("null elements are skipped on both paths (SQL-reachable shape)") {
    // interpreted: nulls interleaved at the tail (array_sort order)
    val withNulls = new GenericArrayData(Array[Any](1L, 2L, 5L, null, null))
    val clean = new GenericArrayData(Array[Any](2L, 5L, 9L))
    val e = SortedIntersectCount(
      BoundReference(0, ArrayType(LongType, containsNull = true), nullable = false),
      BoundReference(1, ArrayType(LongType, containsNull = true), nullable = false))
    assert(e.eval(InternalRow(withNulls, clean)) == 2L)
    assert(e.eval(InternalRow(clean, withNulls)) == 2L)

    // string path through SQL (nullable-element arrays from plain SQL)
    ArraySets.register(spark)
    val r = spark.sql(
      """SELECT graft_sorted_intersect_count(
        |  array_sort(array('b', NULL, 'a')), array('a', 'b', 'c')) AS c
        |""".stripMargin).collect()(0).getLong(0)
    assert(r == 2L)
  }

  test("type check rejects mismatched and unsupported element types") {
    val lt = Literal.create(Seq(1L), ArrayType(LongType))
    val st = Literal.create(Seq("a"), ArrayType(StringType))
    assert(SortedIntersectCount(lt, lt).checkInputDataTypes().isSuccess)
    assert(SortedIntersectCount(st, st).checkInputDataTypes().isSuccess)
    assert(!SortedIntersectCount(lt, st).checkInputDataTypes().isSuccess)
    val it = Literal.create(Seq(1), ArrayType(org.apache.spark.sql.types.IntegerType))
    assert(!SortedIntersectCount(it, it).checkInputDataTypes().isSuccess)
  }

  // -- SortedIntersectLongs (value-returning sibling; triangle pass) ----

  private def evalLongs(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    SortedIntersectLongs(
      Literal.create(a, ArrayType(LongType, containsNull = false)),
      Literal.create(b, ArrayType(LongType, containsNull = false)))
      .eval(InternalRow.empty)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq

  test("property: interpreted longs-intersect returns A ∩ B ascending") {
    Gen.listOfN(200, Gen.zip(longSets, longSets)).sample.get.foreach {
      case (a, b) =>
        assert(evalLongs(a, b) == a.toSet.intersect(b.toSet).toSeq.sorted,
          s"a=$a b=$b")
    }
  }

  test("property: codegen longs-intersect matches the set oracle") {
    import spark.implicits._
    val cases = Gen.listOfN(60, Gen.zip(longSets, longSets)).sample.get
    val df = cases.toDF("a", "b")
      .select(ArraySets.sortedIntersectLongs(spark, col("a"), col("b")).as("c"))
    assert(df.as[Seq[Long]].collect().toSeq ==
      cases.map { case (a, b) => a.toSet.intersect(b.toSet).toSeq.sorted })
  }

  test("longs-intersect skips null elements and rejects non-long arrays") {
    val withNulls = new GenericArrayData(Array[Any](1L, 2L, 5L, null, null))
    val clean = new GenericArrayData(Array[Any](2L, 5L, 9L))
    val e = SortedIntersectLongs(
      BoundReference(0, ArrayType(LongType, containsNull = true), nullable = false),
      BoundReference(1, ArrayType(LongType, containsNull = true), nullable = false))
    assert(e.eval(InternalRow(withNulls, clean))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == Seq(2L, 5L))
    val st = Literal.create(Seq("a"), ArrayType(StringType))
    assert(!SortedIntersectLongs(st, st).checkInputDataTypes().isSuccess)
  }
}
