package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka source/sink configuration builders — the deployment surface
  * of the reference's upsert-kafka topic
  * (`/root/reference/src/ingest.py:35-52`,
  * `/root/reference/src/process.py:122-142`).
  *
  * The Kafka connector jars are not present in this container, so
  * these builders are covered by config-shape tests plus the
  * (connector-independent) upsert JSON key/value projection; on a
  * real cluster `source(spark, sourceOptions(...))` is the working
  * entry point.
  */
object KafkaConfig {

  /** Options for `spark.readStream.format("kafka")`. */
  def sourceOptions(bootstrapServers: String, topic: String,
                    startingOffsets: String = "earliest",
                    failOnDataLoss: Boolean = false,
                    extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++ extra

  /** Options for `df.writeStream.format("kafka")`. */
  def sinkOptions(bootstrapServers: String, topic: String,
                  checkpointLocation: String,
                  extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic,
      "checkpointLocation" -> checkpointLocation) ++ extra

  /** The upsert-kafka wire shape: JSON key (the upsert key columns)
    * and JSON value (the full row), mirroring the reference's
    * key/value JSON formats. Works on bounded and unbounded frames;
    * compaction-by-key then happens on the topic (or in
    * [[CdcCompact]] on the consumer side). */
  def toUpsertRecords(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.select(
      to_json(struct(keyCols.map(col): _*)).as("key"),
      to_json(struct(df.columns.toSeq.map(col): _*)).as("value"))

  /** Kafka source stream (requires the spark-sql-kafka connector on
    * the classpath at runtime). */
  def source(spark: SparkSession, options: Map[String, String]): DataFrame =
    spark.readStream.format("kafka").options(options).load()
}
