package graft

import graft.operators.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** Batch-shape proof for the batched-inference stage (the part the
  * value oracle can't see: batch composition).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("batchEmbed groups items into <=batchSize batches covering all rows") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .limit(10).repartition(2)
    val out = MultimodalOps.batchEmbed(MultimodalOps.toMedia(docs), batchSize = 4)
      .collect()
    assert(out.length == 10)
    assert(out.forall(e => e.batch_size >= 1 && e.batch_size <= 4))
    assert(out.exists(_.batch_size == 4), "no full batch formed")
    assert(out.forall(_.emb.size == 8))
  }

  test("embeddings are independent of batch boundaries and partitioning") {
    val docs = Tables.documents(spark, TestSpark.sf0001).limit(20)
    def embs(parts: Int, bs: Int): Map[Long, Seq[Long]] =
      MultimodalOps.batchEmbed(
        MultimodalOps.toMedia(docs.repartition(parts)), batchSize = bs)
        .collect().map(e => e.doc_id -> e.emb).toMap
    assert(embs(1, 7) == embs(4, 3))
  }
}
