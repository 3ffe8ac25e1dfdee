package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two dimension
  * keys and range-partition + sort the write on the interleaved value,
  * so each output file covers a small RECTANGLE in (x, y) space instead
  * of a thin full-width stripe.
  *
  * Why it matters at 100 TB: parquet readers prune row groups / files
  * with min-max statistics per column. A table sorted on one key prunes
  * perfectly on that key and not at all on any other; a z-ordered
  * layout prunes multi-dimensional box predicates on BOTH keys (each
  * file's min/max box is tight in both), which is the access pattern of
  * "this customer, this date range" style queries. The z-value is
  * layout-only — it never appears in query results, so correctness is
  * independent of it (the oracle runs the same filter on the unsorted
  * table).
  *
  * The interleave is 16 bits per dimension, unrolled into pure integer
  * built-ins (static shifts + AND/OR) — whole-stage-codegen'd, no UDF
  * in the write path.
  */
object ZOrder {

  /** Morton-interleave the low 16 bits of `x` and `y` (both must be
    * non-negative; callers clamp/offset into range): bit i of x lands
    * at 2i, bit i of y at 2i+1.
    */
  def interleave16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  /** Write `df` z-ordered on (x, y) as `files` parquet files: scale
    * each dimension to the full 16-bit grid from its observed min/max
    * (otherwise the data occupies one corner of the morton grid and
    * the cells are coarser than the data extent — no locality), then
    * range-partition on the z-value (contiguous z intervals = small
    * morton rectangles per file), sort within partitions so row groups
    * inside each file are tight too, and drop the layout column.
    *
    * The min/max pass is one metadata-sized agg, the same pre-pass any
    * production z-order writer runs (range binning); the layout column
    * never reaches the written schema.
    */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, files: Int,
      path: String): Unit = {
    val b = df.agg(min(x).cast("long"), max(x).cast("long"),
      min(y).cast("long"), max(y).cast("long")).head()
    def scale(c: Column, lo: Long, hi: Long): Column =
      ((c.cast("long") - lit(lo)) * 65535L / lit(math.max(1L, hi - lo))).cast("long")
    df.withColumn("_z", interleave16(
        scale(x, b.getLong(0), b.getLong(1)),
        scale(y, b.getLong(2), b.getLong(3))))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
