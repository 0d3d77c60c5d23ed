package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for storage-scale pipelines: symmetric int8
  * (scale = 127 / max|x|), the standard 4x shrink before writing an
  * embedding corpus out. Map-only HOF arithmetic — no UDF, no shuffle.
  *
  * Determinism: scale and products are doubles computed identically in
  * DuckDB (float element -> double promotion is exact); `round` is
  * half-away-from-zero in both engines; the quantized values are
  * integer-valued doubles before the int cast, so Spark's truncating cast
  * and DuckDB's rounding cast agree. Zero vectors quantize to all zeros
  * (guarded — an unguarded scale would be infinity). */
object Quantization {

  /** The per-vector scale: 127 / max|x| (0 for a zero vector). */
  def int8Scale(vec: Column): Column = {
    val mx = array_max(transform(vec, x => abs(x))).cast("double")
    when(mx > 0.0, lit(127.0) / mx).otherwise(0.0)
  }

  /** array<int> of round(x * scale) in [-127, 127]. */
  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("int"))

  /** Per-vector quantization audit: value range, checksum, and the max
    * absolute reconstruction error (|q/scale - x|). */
  def quantizationStats(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val scale = int8Scale(col(vecCol))
    val q = quantizeInt8(col(vecCol), scale)
    // zero vector -> scale 0: quantizes to zeros with zero error (ANSI
    // division would throw on the unguarded q/scale)
    val recon = zip_with(q, col(vecCol),
      (qi, x) => when(scale > 0.0,
        abs(qi.cast("double") / scale - x.cast("double"))).otherwise(0.0))
    df.select(
      col(idCol),
      array_min(q).as("q_min"),
      array_max(q).as("q_max"),
      aggregate(q, lit(0L), (acc, x) => acc + x).as("q_sum"),
      round(array_max(recon), 9).as("max_err"))
  }
}
