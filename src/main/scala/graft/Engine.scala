package graft

import org.apache.spark.sql.SparkSession

/** Single SparkSession factory shared by mains and tests.
  *
  * Local-mode defaults tuned per the build contract: shuffle partitions
  * sized to cores (not 200), AQE on (runtime coalescing + skew-join
  * handling — the knobs that matter at cluster scale), UTC session TZ so
  * timestamp semantics match the DuckDB oracle.
  */
object Engine {

  def builder(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Second line of defense behind Tables.normalizeTs: read parquet
      // TIMESTAMP(isAdjustedToUTC=false) as TimestampType directly
      // (identical epoch values under the pinned UTC session TZ), so
      // event-time ops never see TIMESTAMP_NTZ even on a raw read that
      // bypasses the Tables loader.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // Read parquet TIMESTAMP(NANOS) as raw epoch-nano longs instead of
      // failing the scan; Tables.normalizeTs truncates them to micros.
      // Pinned HERE (not mutated inside a loader) so every session —
      // including raw reads that bypass Tables — behaves identically.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def session(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = 32): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
