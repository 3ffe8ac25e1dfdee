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

  /** Perceptual-hash signature (STUB transform, pHash-shaped): 60 block
    * sums over the payload bytes (lane = position mod 60), bit b set
    * iff its block sum exceeds the per-lane average — i.e. the classic
    * "DCT coefficient vs median" rule with the stub's block sums
    * standing in for frequency coefficients. 60 bits (not 64) keeps the
    * signature positive in int64 for both engines, matching the SimHash
    * discipline. Byte-identical payloads always collide; payloads with
    * small localized edits land within a few bits.
    */
  def phash(media: Dataset[MediaRecord]): Dataset[MediaPhash] = {
    val sp = media.sparkSession
    import sp.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val lanes = new Array[Long](60)
        var i = 0
        while (i < m.payload.length) {
          lanes(i % 60) += m.payload(i) & 0xffL
          i += 1
        }
        var total = 0L
        var b = 0
        while (b < 60) { total += lanes(b); b += 1 }
        // bit b <=> 60 * lane_b > total (exact integer compare)
        var h = 0L
        b = 0
        while (b < 60) {
          if (lanes(b) * 60 > total) h |= (1L << b)
          b += 1
        }
        MediaPhash(m.doc_id, h)
      }
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
