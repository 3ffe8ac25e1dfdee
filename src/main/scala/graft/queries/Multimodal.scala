package graft.queries

import graft.{QueryModule, Tables}
import graft.operators.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline surface (see MultimodalOps for the
  * decode-stub contract). Outputs are deterministic functions of the
  * payload bytes, so even the mapPartitions/flatMap stages are
  * value-checked against the DuckDB oracle.
  */
object Multimodal extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary payload -> partition-batched decode -> typed metadata
    "mm_meta" -> ((s, d) =>
      MultimodalOps.decode(MultimodalOps.toMedia(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"))
        .orderBy("doc_id")),

    // metadata -> frame sampling generator (every 3rd frame)
    "mm_frames" -> ((s, d) =>
      MultimodalOps.sampleFrames(
        MultimodalOps.decode(MultimodalOps.toMedia(Tables.documents(s, d))), 3)
        .toDF()
        .orderBy("doc_id", "frame_idx")),

    // per-kind aggregate over decoded metadata
    "mm_kind_stats" -> ((s, d) =>
      MultimodalOps.decode(MultimodalOps.toMedia(Tables.documents(s, d)))
        .toDF()
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n"),
          sum("n_bytes").as("total_bytes"),
          max("width").as("max_width"),
          sum("n_frames").as("total_frames"))
        .orderBy("kind"))
  )

  private val sqlMeta = """
    SELECT doc_id,
           ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
           octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) % 640 + 16 AS width,
           octet_length(encode(text)) % 480 + 16 AS height,
           octet_length(encode(text)) // 1000 + 1 AS n_frames
    FROM documents"""

  override def oracles: Map[String, String] = Map(
    "mm_meta" -> s"""
      SELECT doc_id, kind, n_bytes, width, height, n_frames
      FROM ($sqlMeta)
      ORDER BY doc_id""",

    "mm_frames" -> s"""
      SELECT doc_id, unnest(range(0, n_frames, 3)) AS frame_idx,
             unnest(range(0, n_frames, 3)) * 1000 AS byte_off
      FROM ($sqlMeta)
      ORDER BY doc_id, frame_idx""",

    "mm_kind_stats" -> s"""
      SELECT kind, count(1) AS n,
             sum(n_bytes)::BIGINT AS total_bytes,
             max(width) AS max_width,
             sum(n_frames)::BIGINT AS total_frames
      FROM ($sqlMeta)
      GROUP BY kind
      ORDER BY kind"""
  )
}
