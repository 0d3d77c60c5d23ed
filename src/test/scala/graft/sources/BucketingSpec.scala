package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Co-located bucketed joins: pay the shuffle at write time, join with no
  * exchange forever after — the scale answer for repeated fact-fact joins. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("equally-bucketed tables join with zero Exchange and correct results") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 4)
    try {
      assert(Bucketing.coLocatedJoinIsShuffleFree(spark, "b_orders", "b_lineitem", "o_orderkey"),
        "bucketed join must not shuffle")
      // same rows as the plain (shuffling) join
      val bucketed = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey").count()
      val plain = orders.join(lineitem, "o_orderkey").count()
      assert(bucketed == plain)
      // the plain parquet-to-parquet join DOES shuffle (sanity: the assert
      // above is meaningful). Broadcast can also avoid Exchange, so disable
      // it for this check.
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plainPlan = orders.join(lineitem, "o_orderkey")
          .queryExecution.executedPlan.toString
        assert(plainPlan.contains("Exchange"))
        val bucketedPlan = Bucketing
          .bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
          .queryExecution.executedPlan.toString
        assert(!bucketedPlan.contains("Exchange"))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
