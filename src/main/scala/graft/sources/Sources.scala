package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format connector surface: uniform read/write over the formats
  * the engine supports (the reference has exactly one source — a whole
  * local file read, main.c:74-110 — generalized here to Spark's
  * splittable, predicate-pushing file sources).
  *
  * Read options are chosen for pipeline correctness at scale:
  * parquet/orc keep column pruning + filter pushdown; csv/json get an
  * explicit schema (schema inference is a full extra pass over 100 TB —
  * never rely on it in production paths).
  */
object Sources {

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema) // explicit: no inference pass
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString).csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Compact a directory of small parquet files into
    * ceil(totalBytes / targetBytes) files of ~targetBytes each — the
    * operational answer to the small-files problem (a 100 TB pipeline
    * writing per-micro-batch or per-partition files degrades every
    * downstream scan's split planning and NameNode/listing cost).
    *
    * Uses `coalesce` (narrow — no shuffle: each output task
    * concatenates input splits) unless the caller asks to
    * `sortBy` first, in which case the rewrite pays one range shuffle
    * and buys data-skipping locality (min/max pruning) on the sort key.
    * Returns the compacted file count.
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20, sortBy: Seq[String] = Nil): Int = {
    val src = new java.io.File(dir)
    val totalBytes = Option(src.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val nOut = math.max(1, ((totalBytes + targetBytes - 1) / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val out =
      if (sortBy.nonEmpty)
        df.repartitionByRange(nOut, sortBy.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(sortBy.head, sortBy.tail: _*)
      else df.coalesce(nOut)
    val tmp = dir.stripSuffix("/") + "_compacted_tmp"
    out.write.mode(SaveMode.Overwrite).parquet(tmp)
    // atomic-ish swap: replace the directory only after a full write
    val tmpFile = new java.io.File(tmp)
    val bak = new java.io.File(dir.stripSuffix("/") + "_precompact")
    if (bak.exists()) { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete() }
      rm(bak)
    }
    if (!src.renameTo(bak))
      throw new java.io.IOException(
        s"compactParquet: cannot move $dir aside (open handles? cross-device?);" +
          s" compacted output left at $tmp")
    if (!tmpFile.renameTo(src)) {
      bak.renameTo(src) // best-effort restore of the original directory
      throw new java.io.IOException(
        s"compactParquet: cannot move $tmp into place; original restored")
    }
    Option(src.listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
  }
}
