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

  // ---- DCT pHash transform properties ------------------------------

  test("DCT: constant luma has zero AC energy -> phash 0") {
    // a flat image is pure DC; every kept AC coefficient is exactly 0
    // (integer cancellation: sum_x cos_u(x) = 0 in the Q14 table for
    // u > 0 up to rounding — verify both the coefficients and the hash)
    val flat = Array.fill(4096)('a'.toByte) // every lane = 4*97 mod 256
    val f = MultimodalOps.dctCoefs(MultimodalOps.lumaOf(flat))
    assert(f(0) != 0L, "DC term of a bright flat image must be nonzero")
    val acMax = (1 until 64).map(i => math.abs(f(i))).max
    // rounding of the Q14 table leaves at most |pix| * 32 * 2^14 worth
    // of residue per half-unit of rounding error; in practice the
    // cosine rows sum to 0 exactly for even u and to <= 8 units for
    // odd, so AC residue is tiny vs any real signal (~1e10+)
    assert(acMax < (1L << 24), s"flat image leaked AC energy: $acMax")
    assert(MultimodalOps.phashOf(flat) == 0L,
      "flat image must hash to 0 (no coefficient above the median)")
  }

  test("DCT: linearity — coefficients of a+b equal sum of coefficients") {
    val rnd = new scala.util.Random(7)
    val a = Array.fill(1024)(rnd.nextInt(120))
    val b = Array.fill(1024)(rnd.nextInt(120))
    val ab = Array.tabulate(1024)(i => a(i) + b(i))
    val fa = MultimodalOps.dctCoefs(a)
    val fb = MultimodalOps.dctCoefs(b)
    val fab = MultimodalOps.dctCoefs(ab)
    assert((0 until 64).forall(i => fab(i) == fa(i) + fb(i)))
  }

  test("DCT: frequency selectivity — a cos(u=2) pattern peaks at F(2,0)") {
    // pix(x, y) = 128 + 100*cos((2x+1)*2*pi/64): energy concentrates in
    // the (u=2, v=0) bin; every other kept (u, 0) AC bin stays orders
    // of magnitude below. This pins that the table really is the DCT
    // basis (a wrong stride/transpose would move or smear the peak).
    val pix = Array.tabulate(1024) { i =>
      val x = i / 32
      128 + math.round(100.0 * math.cos((2 * x + 1) * 2 * math.Pi / 64)).toInt
    }
    val f = MultimodalOps.dctCoefs(pix)
    val peak = math.abs(f(2 * 8))
    val others = (1 until 8).filter(_ != 2).map(u => math.abs(f(u * 8))).max
    assert(peak > others * 100,
      s"F(2,0)=$peak not dominant vs other (u,0) bins max=$others")
  }

  test("phash: byte-identical payloads collide; small edits stay near") {
    val base = ("the quick brown fox jumps over the lazy dog " * 40).getBytes
    val copy = base.clone()
    assert(MultimodalOps.phashOf(base) == MultimodalOps.phashOf(copy))
    // flip a handful of bytes: a localized edit perturbs each luma lane
    // by < 256, so most median-thresholded bits survive
    val edited = base.clone()
    (0 until 5).foreach(k => edited(k * 37) = 'Z'.toByte)
    val d = java.lang.Long.bitCount(
      MultimodalOps.phashOf(base) ^ MultimodalOps.phashOf(edited))
    assert(d <= 10, s"5-byte edit moved $d of 60 bits")
    // and 60-bit signatures stay positive (pair pipeline contract)
    assert(MultimodalOps.phashOf(base) >= 0L)
  }
}
