package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark lacks natively.
  *
  * For each left row, attach the payload of the latest right row with
  * the same key and `right.ts <= left.ts` (ties match). Duplicate
  * right rows on (key, ts) resolve deterministically: the greatest
  * payload tuple wins backward, the smallest forward. Precondition of
  * that rule: payload columns must be of orderable types (they join
  * the window ORDER BY) — a map-typed payload fails analysis; wrap it
  * in a struct alongside an orderable discriminator if needed.
  *
  * Implementation is the scalable union-tag formulation, not a range
  * join: tag both inputs, union, then one `last(payload, ignoreNulls)`
  * running window per key ordered by (ts, tag). Cost = ONE shuffle +
  * sort on (key, ts) — linear in |L|+|R| and partitioned by key, vs the
  * quadratic bucket explosion of a naive interval join. This is the
  * plan shape that survives 100 TB: no broadcast requirement, no skew
  * beyond the key distribution itself (salt the key upstream if one
  * key dominates).
  *
  * (Per the custom-operator preference order, this composes existing
  * operators — no new SparkPlan needed; Catalyst still optimizes the
  * surrounding plan freely.)
  */
object AsofJoin {

  /** @param left      probe side; all its columns are preserved
    * @param right     reference side
    * @param key       equi-join column name (same name both sides)
    * @param ts        event-time column name (same name both sides)
    * @param payload   right-side columns to attach (renamed via `rename`)
    * @param rename    output name for each payload column
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      rename: Map[String, String]): DataFrame = {
    val outNames = payload.map(p => rename.getOrElse(p, p))
    val leftCols = left.columns.filterNot(c => c == key || c == ts).toSeq

    // Right rows carry payload; left rows carry their own columns.
    val taggedRight = right.select(
      Seq(col(key), col(ts), lit(0).as("_tag")) ++
        payload.zip(outNames).map { case (p, o) => col(p).as(o) } ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(ts), lit(1).as("_tag")) ++
        payload.zip(outNames).map { case (p, o) =>
          lit(null).cast(right.schema(p).dataType).as(o)
        } ++
        leftCols.map(col): _*)

    // payload columns as final tie-breakers: duplicate right (key, ts)
    // rows would otherwise make the pick nondeterministic (partition-
    // layout dependent); with them, the GREATEST payload tuple wins —
    // defined semantics, stable across runs and engines
    val w = Window.partitionBy(key)
      .orderBy(col(ts) +: col("_tag") +: outNames.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = taggedRight.unionByName(taggedLeft)
      .select(
        Seq(col(key), col(ts), col("_tag")) ++
          leftCols.map(col) ++
          outNames.map(o => last(col(o), ignoreNulls = true).over(w).as(o)): _*)
    filled.filter(col("_tag") === 1).drop("_tag")
  }

  /** Forward as-of join: attach the payload of the EARLIEST right row
    * with the same key and `right.ts >= left.ts` (ties match). Mirror
    * image of [[asofBackward]]: left rows sort before right rows at
    * equal ts (so same-ts rights are in frame), and the running window
    * looks forward with `first(payload, ignoreNulls)`. Same single
    * shuffle + sort cost shape.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      rename: Map[String, String]): DataFrame = {
    val outNames = payload.map(p => rename.getOrElse(p, p))
    val leftCols = left.columns.filterNot(c => c == key || c == ts).toSeq

    val taggedRight = right.select(
      Seq(col(key), col(ts), lit(1).as("_tag")) ++
        payload.zip(outNames).map { case (p, o) => col(p).as(o) } ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(ts), lit(0).as("_tag")) ++
        payload.zip(outNames).map { case (p, o) =>
          lit(null).cast(right.schema(p).dataType).as(o)
        } ++
        leftCols.map(col): _*)

    // tie-breaker mirror of asofBackward: among duplicate right
    // (key, ts) rows the SMALLEST payload tuple wins (deterministic)
    val w = Window.partitionBy(key)
      .orderBy(col(ts) +: col("_tag") +: outNames.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = taggedRight.unionByName(taggedLeft)
      .select(
        Seq(col(key), col(ts), col("_tag")) ++
          leftCols.map(col) ++
          outNames.map(o => first(col(o), ignoreNulls = true).over(w).as(o)): _*)
    filled.filter(col("_tag") === 0).drop("_tag")
  }

  /** Backward as-of join with a maximum lookback: matches further than
    * `toleranceUs` behind the left timestamp are nulled out (the
    * standard as-of tolerance knob; `ts` must be numeric, e.g. epoch
    * micros). Composes [[asofBackward]]: the matched right timestamp
    * rides along as an extra payload and gates every output column.
    */
  def asofBackwardWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      rename: Map[String, String],
      toleranceUs: Long): DataFrame = {
    val rts = "_asof_rts"
    val joined = asofBackward(left, right.withColumn(rts, col(ts)),
      key, ts, payload :+ rts, rename)
    val outNames = payload.map(p => rename.getOrElse(p, p))
    outNames.foldLeft(joined) { (df, o) =>
      // no-match (rts null) keeps null via three-valued logic
      df.withColumn(o, when(col(ts) - col(rts) <= toleranceUs, col(o)))
    }.drop(rts)
  }

  /** Nearest as-of join: attach the payload of the right row closest in
    * time in EITHER direction (pandas `merge_asof(direction='nearest')`).
    * Ties — equal distance behind and ahead — resolve BACKWARD.
    *
    * Composes the two linear union-tag passes and joins them on
    * `leftId`, which the caller must guarantee unique per left row
    * (there is no deterministic way to synthesize one inside the
    * operator: generated ids would depend on partition layout, and the
    * two legs each re-execute the left plan). Cost: two key-partitioned
    * sort passes + one equi-join on the unique id — still no interval
    * cross-product, still skew-bounded by the key distribution.
    *
    * `ts` must be numeric (e.g. epoch micros) so distances subtract
    * exactly.
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      leftId: String,
      payload: Seq[String],
      rename: Map[String, String]): DataFrame = {
    // the equi-join on leftId below silently MULTIPLIES rows if leftId
    // is not a real, distinct left column — fail loudly instead
    require(left.columns.contains(leftId),
      s"asofNearest: leftId '$leftId' is not a column of the left side " +
        s"(${left.columns.mkString(", ")})")
    require(leftId != key && leftId != ts,
      s"asofNearest: leftId '$leftId' must be a unique row id, not the " +
        "join key or timestamp (duplicates would cross-match the legs)")
    // right ts always rides first so the distance compare has both legs
    val pcols = ts +: payload.filterNot(_ == ts)
    val bMap = pcols.zipWithIndex.map { case (p, i) => p -> s"_b$i" }.toMap
    val fMap = pcols.zipWithIndex.map { case (p, i) => p -> s"_f$i" }.toMap
    val b = asofBackward(left, right, key, ts, pcols, bMap)
    val f = asofForward(left, right, key, ts, pcols, fMap)
      .select((leftId +: pcols.indices.map(i => s"_f$i")).map(col): _*)
    // backward wins when forward is absent, or when its distance is no
    // greater (three-valued logic safe: the comparison only decides
    // when both legs matched)
    val takeB = col("_f0").isNull || (col("_b0").isNotNull &&
      (col(ts) - col("_b0")) <= (col("_f0") - col(ts)))
    val outCols = payload.map { p =>
      val i = pcols.indexOf(p)
      when(takeB, col(s"_b$i")).otherwise(col(s"_f$i"))
        .as(rename.getOrElse(p, p))
    }
    b.join(f, Seq(leftId))
      .select(left.columns.map(col).toSeq ++ outCols: _*)
  }
}
