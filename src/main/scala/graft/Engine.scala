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
      // Local[n] = the "executor" IS the driver JVM, so a long full-GC
      // pause or a co-tenant CPU-starvation stall freezes heartbeats
      // for both sides at once — and the default 120 s expiry then
      // KILLS the only executor, wedging the whole session (observed
      // r16: a 127.7 s stall under box load 22 took down a sweep at
      // scaled_lpa_x20). A real cluster wants prompt expiry to replace
      // lost remote executors; single-JVM local mode has nothing to
      // replace, so the honest move is tolerating stalls up to the
      // scale of the longest observed one.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "20s")
      .config("spark.ui.enabled", "false")

  def session(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = 32): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
