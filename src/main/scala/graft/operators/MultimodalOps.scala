package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A media payload row: opaque bytes + typed metadata. In a production
  * corpus `payload` holds the image/audio/video bytes (or a storage
  * pointer); here the documents' UTF-8 text stands in as the payload so
  * the pipeline is runnable in this container.
  */
case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

/** Decoded (or probed) media metadata. */
case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
    width: Long, height: Long, n_frames: Long)

/** One sampled frame reference: byte-range into the payload. */
case class FrameRef(doc_id: Long, frame_idx: Long, byte_off: Long)

/** One sampled frame's content signature (stub luma hash). */
case class FrameSig(doc_id: Long, frame_idx: Long, sig: Long)

/** Extracted feature vector (stub model output). */
case class MediaFeatures(doc_id: Long, features: Seq[Long])

case class MediaPhash(doc_id: Long, phash: Long)

/** Resize parameters: integer milli-scale factors to a target box. */
case class ResizePlan(doc_id: Long, new_w: Long, new_h: Long,
    scale_x_e3: Long, scale_y_e3: Long)

/** Stub model output: one embedding per item + the size of the batch
  * it was inferred in (batch bookkeeping for tests; excluded from
  * oracle-checked output because it depends on partitioning).
  */
case class MediaEmbedding(doc_id: Long, emb: Seq[Long], batch_size: Long)

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed per-partition (the Scala analog of a batched
  * `mapInPandas` decode stage).
  *
  * The decode itself is a STUB — image/audio codecs are not available
  * in this container, so `decode` derives deterministic fake dimensions
  * from the byte stream. Everything around it is real and is the part
  * that matters at scale: binary columns through parquet, case-class
  * encoders, partition-batched iteration (decoder state amortized
  * per-partition, not per-row), and a generator stage (frame sampling)
  * that explodes rows without materializing frames in memory.
  */
object MultimodalOps {

  /** Absolute consecutive-frame signature jump that counts as a scene
    * cut (mm_scene_cuts); shared with the oracle SQL. */
  val SCENE_TAU = 500L

  /** Signature frame width in bytes (mm_scene_cuts). */
  val SIG_FRAME_W = 100L

  /** Wrap a text corpus as media payloads (binary column + kind tag). */
  def toMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(
      col("doc_id"),
      // deterministic kind assignment standing in for a real mime type
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decode: replace the body of `decodeOne` with a real codec
    * (e.g. javax.imageio / ffmpeg bindings) in production. Deterministic
    * fake: dimensions derived from payload length.
    */
  private def decodeOne(m: MediaRecord): MediaMeta = {
    val n = m.payload.length.toLong
    MediaMeta(
      doc_id = m.doc_id,
      kind = m.kind,
      n_bytes = n,
      width = n % 640 + 16,
      height = n % 480 + 16,
      n_frames = n / 1000 + 1)
  }

  /** Partition-batched decode: the iterator shape lets a real decoder
    * init once per partition (model load, codec context) and stream
    * rows through it.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { it =>
      // (real impl: open codec context here, close on iterator end)
      it.map(decodeOne)
    }
  }

  /** Sample every `step`-th frame as a byte-range reference — a
    * flatMap generator that never materializes frame payloads.
    */
  def sampleFrames(meta: Dataset[MediaMeta], step: Int): Dataset[FrameRef] = {
    val sp = meta.sparkSession
    import sp.implicits._
    meta.flatMap { m =>
      (0L until m.n_frames by step.toLong)
        .map(i => FrameRef(m.doc_id, i, i * 1000L))
    }
  }

  /** Per-frame content signature: the sum of the frame's payload byte
    * window (the deterministic stub stand-in for a real per-frame
    * histogram/phash — swap the window fold for a decoder + luma hash
    * in production). Generator-shaped like [[sampleFrames]]: frames
    * explode per payload without materializing frame content. The
    * signature frame is SIG_FRAME_W bytes — finer than mm_frames's
    * 1000-byte sampling frames, because cut detection needs
    * consecutive windows even on short payloads.
    */
  def frameSignatures(media: Dataset[MediaRecord],
      step: Int): Dataset[FrameSig] = {
    val sp = media.sparkSession
    import sp.implicits._
    val w = SIG_FRAME_W
    media.flatMap { m =>
      val n = m.payload.length
      val nFrames = n / w + 1
      (0L until nFrames by step.toLong).map { fi =>
        val off = (fi * w).toInt
        val end = math.min(off + w, n)
        var s = 0L
        var i = off
        while (i < end) { s += (m.payload(i) & 0xff); i += 1 }
        FrameSig(m.doc_id, fi, s)
      }
    }
  }

  /** Feature-extraction stage (STUB model): an 8-dim integer "embedding"
    * per payload — component i = sum of payload bytes at positions
    * congruent to i (mod 8). Deterministic, so the whole stage is
    * value-checked by the oracle; a real deployment swaps the body for
    * a model forward pass (the per-partition iterator shape is exactly
    * where the model would be loaded once).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { it =>
      // (real impl: load model weights here, once per partition)
      it.map { m =>
        val f = new Array[Long](8)
        var i = 0
        while (i < m.payload.length) {
          f(i % 8) += m.payload(i) & 0xffL
          i += 1
        }
        MediaFeatures(m.doc_id, f.toSeq)
      }
    }
  }

  /** Fixed-point DCT-II basis, Q14: `DctCosQ(u)(x) = round(2^14 *
    * cos((2x+1) * u * pi / 64))` for kept frequency u in 0..7 over
    * spatial position x in 0..31 — the 32-point DCT rows that project
    * onto the 8 lowest frequencies (the classic pHash keeps the top-left
    * 8x8 of a 32x32 DCT). Single source of truth for BOTH the Scala
    * transform and the DuckDB oracle: Multimodal inlines these exact
    * integers into the oracle SQL, so the compare is bit-exact with no
    * floating point anywhere downstream of this table.
    */
  val DctCosQ: Array[Array[Long]] =
    Array.tabulate(8, 32)((u, x) =>
      math.round(16384.0 * math.cos((2 * x + 1) * u * math.Pi / 64)))

  /** Synthetic decode+resize: payload bytes -> 32x32 8-bit luma plane.
    * Lane i accumulates bytes at positions congruent to i (mod 1024) —
    * a strided box filter standing in for codec decode + area resize
    * (no image codecs in this container); a production build swaps this
    * one function for `decode(payload) |> grayscale |> resize(32,32)`
    * and the DCT/hash stages below run unchanged. mod 256 keeps each
    * pixel in the 8-bit range a real luma plane would have.
    */
  private[graft] def lumaOf(payload: Array[Byte]): Array[Int] = {
    val acc = new Array[Long](1024)
    var j = 0
    while (j < payload.length) { acc(j & 1023) += payload(j) & 0xffL; j += 1 }
    val pix = new Array[Int](1024)
    var i = 0
    while (i < 1024) { pix(i) = (acc(i) % 256).toInt; i += 1 }
    pix
  }

  /** 2-D DCT-II of a 32x32 luma plane, keeping the 8x8 low-frequency
    * block: `F(u,v) = sum_{x,y} pix(x,y) * cos_u(x) * cos_v(y)` in Q28
    * fixed point (two Q14 factors), computed separably — row pass then
    * column pass, integer-exact (multiplication distributes over the
    * sums, so the separable result equals the direct double sum term
    * for term). Max magnitude ~7e13, far inside int64. Returned
    * row-major: index u*8+v; (0,0) is the DC term.
    */
  private[graft] def dctCoefs(pix: Array[Int]): Array[Long] = {
    val g = Array.ofDim[Long](32, 8) // g(x)(v) = sum_y pix(x,y) * cos_v(y)
    var x = 0
    while (x < 32) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < 32) { s += pix(x * 32 + y) * DctCosQ(v)(y); y += 1 }
        g(x)(v) = s
        v += 1
      }
      x += 1
    }
    val f = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var xx = 0
        while (xx < 32) { s += g(xx)(v) * DctCosQ(u)(xx); xx += 1 }
        f(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    f
  }

  /** DCT perceptual hash of one payload: luma -> 2-D DCT -> the 60
    * lowest-frequency AC coefficients (row-major u*8+v in 1..60 — DC
    * dropped, and 60 rather than 63 keeps the signature positive in
    * int64 and on the 4x15-bit pigeonhole grid the pair pipeline
    * shares with SimHash) -> bit b set iff coefficient b+1 exceeds the
    * LOWER MEDIAN (30th smallest of 60; an order statistic, so it is
    * tie-stable and integer-exact in any engine). Median thresholding
    * is what makes the hash brightness/contrast-invariant: any
    * monotone per-coefficient scaling preserves every bit.
    */
  private[graft] def phashOf(payload: Array[Byte]): Long = {
    val f = dctCoefs(lumaOf(payload))
    val kept = java.util.Arrays.copyOfRange(f, 1, 61)
    val sorted = kept.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(29)
    var h = 0L
    var b = 0
    while (b < 60) { if (kept(b) > med) h |= 1L << b; b += 1 }
    h
  }

  /** Perceptual-hash signatures: the real DCT pHash transform
    * ([[phashOf]]) over every payload. Byte-identical payloads always
    * collide (Hamming 0); small localized edits move a few low-order
    * coefficients and land within a few bits.
    */
  def phash(media: Dataset[MediaRecord]): Dataset[MediaPhash] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { it =>
      it.map(m => MediaPhash(m.doc_id, phashOf(m.payload)))
    }
  }

  /** Resize planning (STUB codec): integer scale factors (x1000) to fit
    * a 224x224 target from the fake-decoded dimensions.
    */
  def resizePlan(meta: Dataset[MediaMeta], target: Long = 224): Dataset[ResizePlan] = {
    val sp = meta.sparkSession
    import sp.implicits._
    meta.map { m =>
      ResizePlan(m.doc_id, target, target,
        target * 1000L / m.width, target * 1000L / m.height)
    }
  }

  /** Batched inference (STUB model): items flow through the "model" in
    * fixed-size batches via `grouped(batchSize)` — the batch-shape
    * plumbing of a real GPU embedding stage (one forward pass per
    * group, weights loaded once per partition; this is the Scala analog
    * of `mapInPandas` with a batch size). The stub embedding is
    * deterministic per item — dim j = signed 16-bit from md5(payload)
    * byte pair j — so the VALUES are oracle-checkable even though batch
    * composition depends on partitioning (batch_size is bookkeeping for
    * MultimodalSpec, not part of the checked output).
    */
  def batchEmbed(media: Dataset[MediaRecord], batchSize: Int = 32): Dataset[MediaEmbedding] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { it =>
      // (real impl: load model weights here, once per partition)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        // (real impl: ONE forward pass over the whole batch here)
        batch.map { m =>
          md.reset()
          val d = md.digest(m.payload)
          val emb = (0 until 8).map { j =>
            (((d(2 * j) & 0xffL) << 8) | (d(2 * j + 1) & 0xffL)) - 32768L
          }
          MediaEmbedding(m.doc_id, emb, batch.size.toLong)
        }
      }
    }
  }
}
