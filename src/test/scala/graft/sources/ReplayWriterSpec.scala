package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.v2.ReplayDataSource

/** The graft-replay DataSourceV2 WRITE path: append/overwrite round-trips
  * through the connector, task-commit file visibility, ts-stat pruning of
  * self-written data, and fail-fast schema validation. */
class ReplayWriterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fresh(tag: String) = s"/tmp/graft_v2_write_${tag}_${System.nanoTime()}"

  private def viaConnector(path: String) =
    spark.read.format("graft-replay").option("tsCol", "ts").load(path)

  test("append to a fresh path round-trips all supported types (incl. nulls)") {
    import spark.implicits._
    val path = fresh("roundtrip")
    val df = (0L until 2000L).map { i =>
      (i, if (i % 7 == 0) None else Some(i % 2 == 0),
        if (i % 5 == 0) None else Some(i.toInt * 3),
        if (i % 11 == 0) None else Some(s"s$i"),
        if (i % 3 == 0) None else Some(i.toFloat / 7f),
        if (i % 13 == 0) None else Some(i.toDouble / 11d))
    }.toDF("ts", "b", "i", "s", "f", "d")
    df.write.format("graft-replay").mode("append").save(path)
    val back = viaConnector(path).orderBy("ts").collect().toSeq
    assert(back == df.orderBy("ts").collect().toSeq)
    // the built-in parquet reader agrees too (files are plain parquet)
    assert(spark.read.parquet(path).orderBy("ts").collect().toSeq == back)
  }

  test("each task writes its own file; no in-progress files survive commit") {
    import spark.implicits._
    val path = fresh("tasks")
    (0L until 1000L).map(i => (i, s"p$i")).toDF("ts", "v")
      .repartition(4)
      .write.format("graft-replay").mode("append").save(path)
    val files = new java.io.File(path).listFiles().map(_.getName).toSeq
    assert(files.count(_.endsWith(".parquet")) == 4)
    assert(!files.exists(_.contains("inprogress")), files.toString)
  }

  test("second append adds rows; overwrite truncates to the new data only") {
    import spark.implicits._
    val path = fresh("modes")
    (0L until 100L).map(i => (i, i)).toDF("ts", "v")
      .coalesce(1).write.format("graft-replay").mode("append").save(path)
    (100L until 150L).map(i => (i, i)).toDF("ts", "v")
      .coalesce(1).write.format("graft-replay").mode("append").save(path)
    assert(viaConnector(path).count() == 150L)
    (0L until 50L).map(i => (i, -i)).toDF("ts", "v")
      .coalesce(1).write.format("graft-replay").mode("overwrite").save(path)
    assert(viaConnector(path).count() == 50L)
    assert(viaConnector(path).agg(min(col("v"))).collect()(0).getLong(0) == -49L)
  }

  test("self-written files are immediately prunable by the cursor reader") {
    import spark.implicits._
    val path = fresh("prune")
    // three time-sliced appends = three files, disjoint ts ranges
    (0 until 3).foreach { d =>
      (0L until 1000L).map(i => (d * 1000L + i, s"d$d-$i")).toDF("ts", "v")
        .coalesce(1).write.format("graft-replay").mode("append").save(path)
    }
    val idx = ReplayDataSource.index(path)
    assert(idx.groups.length == 3)
    assert(idx.groups.forall(g => g.tsMin.isDefined && g.tsMax.isDefined))
    val sliced = viaConnector(path).where(col("ts") > 1100L && col("ts") <= 1200L)
    assert(sliced.rdd.getNumPartitions == 1) // two of three groups pruned
    assert(sliced.count() == 100L)
  }

  test("unsupported (nested) write schemas fail fast at planning") {
    import spark.implicits._
    val path = fresh("badschema")
    val e = intercept[Exception] {
      Seq((1L, Seq(1f, 2f))).toDF("ts", "emb")
        .write.format("graft-replay").mode("append").save(path)
    }
    assert(e.getMessage.contains("flat primitive schemas"), e.getMessage)
    assert(!new java.io.File(path).exists() ||
      new java.io.File(path).listFiles().forall(!_.getName.endsWith(".parquet")))
  }
}
