package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries.
  *
  * `queries` maps name -> (session, sfDir) -> result DataFrame.
  * `oracles` maps the same names to equivalent DuckDB SQL over the same
  * parquet tables; names absent from `oracles` get the driver's weaker
  * rows-only check (reserved for ops not expressible in ANSI SQL).
  *
  * Determinism contract: every query ends in a total ORDER BY (all ties
  * broken by a unique key) and every floating aggregate is rounded, so
  * the driver's row/hash compare is stable across engines and runs.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
