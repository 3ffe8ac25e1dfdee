package graft

import org.scalatest.funsuite.AnyFunSuite

/** sim_stream_ingest: the streaming leg of the ANN index lifecycle.
  * The stream-static scoring + batch-side argmax must compute the SAME
  * frozen-centroid assignment as the batch append (sim_index_append's
  * loaded-artifact serve) — which is also why the append oracle gates
  * the streaming row verbatim. ivfServe ends in a total order, so
  * plain Seq equality is a bit-level check.
  */
class StreamIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming ingest serve equals the batch append serve") {
    val streamed = SparkEntry.queries("sim_stream_ingest")(
      spark, TestSpark.sf0001).collect().toSeq
    val batch = SparkEntry.queries("sim_index_append")(
      spark, TestSpark.sf0001).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "stream-ingested serve differs from the batch append serve")
  }
}
