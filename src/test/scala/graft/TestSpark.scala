package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by all suites (SURVEY §7.1). */
object TestSpark {
  lazy val spark: SparkSession = Engine.session("local[4]", shufflePartitions = 4)
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
