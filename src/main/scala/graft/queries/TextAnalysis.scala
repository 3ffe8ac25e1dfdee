package graft.queries

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, SparkSession}

object TextAnalysis extends QueryModule {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override def oracles: Map[String, String] = Map()
}
