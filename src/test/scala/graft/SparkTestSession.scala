package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-touching test suites. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkEntry.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
