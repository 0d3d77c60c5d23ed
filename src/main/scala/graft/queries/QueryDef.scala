package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: the Spark-first implementation plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB over
  * the same parquet tables. Column names/aliases MUST match between the two
  * (the driver's compare sorts columns by name before hashing). */
final case class QueryDef(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object QueryDef {
  /** Load one of the driver-generated tables (`TESTDATA.md`), with the
    * event-time column normalized to the engine-wide long-nanos convention
    * ([[graft.replay.TsNanos.normalize]] — the driver has shipped `ts` as
    * both TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds). */
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.replay.TsNanos.normalize(spark.read.parquet(s"$dir/$name.parquet"))

  /** Root for indexes a query persists and re-reads ([[graft.ext.IndexStore]]
    * — the q351/q352 build→write→read→answer shape). Keyed by the sf dir's
    * basename so concurrent runs at different scales never collide; writes
    * use overwrite mode, so re-running a query is idempotent. */
  def indexRoot(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_index_${new java.io.File(dir).getName}"
}
