package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ext.Similarity

/** The custom codegen expression must be bit-identical to the HOF fold. */
class VecDotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("graft_vec_dot matches the HOF double fold bit-for-bit on float arrays") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("vb")))
      .where(col("a_id") < col("b_id")).limit(2000)
    val diff = pairs.select(
      (Similarity.dot(col("va"), col("vb")) - Similarity.dotHof(col("va"), col("vb"))).as("d"))
      .where(col("d") =!= 0.0).count()
    assert(diff == 0L)
  }

  test("graft_vec_dot handles double arrays and interpreted eval") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(Similarity.dot(col("a"), col("b"))).head.getDouble(0) == 32.0)
    // null propagation
    val withNull = df.select(Similarity.dot(lit(null).cast("array<double>"), col("b")))
    assert(withNull.head.isNullAt(0))
  }
}
