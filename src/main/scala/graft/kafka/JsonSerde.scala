package graft.kafka

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.replay.SparkBatch

/** JSON wire-format serde with an EXPLICIT schema — no inference, matching
  * the reference (`beavers/pyarrow_kafka.py:16-49`): newline-joined JSON
  * messages -> table, and rows -> per-record JSON messages.
  *
  * Spark-first: `from_json`/`to_json` are codegen'd; at scale this runs
  * inside the kafka micro-batch map stage with no extra shuffle.
  */
object JsonSerde {

  /** Deserialize a cycle's raw messages into a [[SparkBatch]] with the given
    * schema (reference `JsonArrowDeserializer`, `pyarrow_kafka.py:20-34`). */
  def deserializer(spark: SparkSession, schema: StructType): MessageDeserializer[SparkBatch] =
    (messages: Seq[KMessage]) => {
      import spark.implicits._
      if (messages.isEmpty) SparkBatch(spark.emptyDataFrame, 0)
      else {
        val json = messages.map(m => new String(m.value, "UTF-8")).toDS()
        val df = json.select(from_json(col("value"), schema).as("r")).select(col("r.*"))
        SparkBatch(df, messages.size.toLong)
      }
    }

  /** Serialize a sink's DataFrame to per-row JSON messages (reference
    * `JsonArrowSerializer`, `pyarrow_kafka.py:37-49`). `keyCol` supplies the
    * kafka key. Collects the cycle's (small) output delta to the driver —
    * sinks carry per-cycle updates, not full tables. */
  def serializer(topic: String, keyCol: String): MessageSerializer[DataFrame] =
    (df: DataFrame) => {
      df.select(col(keyCol).cast("string").as("k"), to_json(struct(col("*"))).as("v"))
        .collect()
        .map(r => ProducerMessage(topic,
          Option(r.getString(0)).map(_.getBytes("UTF-8")).orNull,
          r.getString(1).getBytes("UTF-8")))
        .toSeq
    }
}
