package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** int8 quantization units (q52). */
class QuantizationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("quantized values stay in [-127,127]; extreme element hits the rail") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.5f, -1.0f, 0.25f))).toDF("vec_id", "embedding")
    val row = Quantization.quantizationStats(df, "embedding", "vec_id").collect().head
    assert(row.getInt(1) == -127) // the max-magnitude element maps to the rail
    assert(row.getInt(2) == 64)   // 0.5 * 127 = 63.5 -> half-up 64
    assert(row.getLong(3) == 64L + (-127L) + 32L)
  }

  test("zero vector quantizes to zeros with zero error") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val row = Quantization.quantizationStats(df, "embedding", "vec_id").collect().head
    assert(row.getInt(1) == 0 && row.getInt(2) == 0 && row.getLong(3) == 0L)
    assert(row.getDouble(4) == 0.0)
  }

  test("reconstruction error bounded by half a quantization step on real corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val stats = Quantization.quantizationStats(emb, "embedding", "vec_id")
      .join(emb.select(col("vec_id"),
        Quantization.int8Scale(col("embedding")).as("scale")), "vec_id")
    val bad = stats.where(col("max_err") > lit(0.5) / col("scale") + 1e-9).count()
    assert(bad == 0, "every element must reconstruct within 0.5/scale")
  }
}
