package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.AvroCodec

/** Kafka publish surface — the engine's outbound half (the reference
  * only consumes; a complete engine also writes change/derived streams
  * back). Spark's Kafka sink expects (key binary, value binary[, topic])
  * columns; these builders assemble them with Confluent-framed Avro
  * values so downstream registry-aware consumers (like the reference's
  * main.py) can read what we publish.
  */
object KafkaSink {

  /** Assemble sink-shaped records: key from a string/binary column,
    * value = Confluent-framed Avro of `valueStruct`. */
  def toRecords(
      df: DataFrame,
      key: Column,
      valueStruct: Column,
      valueSchemaJson: String,
      schemaId: Int,
      topic: String): DataFrame =
    df.select(
      key.cast("binary").as("key"),
      AvroCodec.toConfluentAvro(valueStruct, valueSchemaJson, schemaId)
        .as("value"),
      lit(topic).as("topic"))

  /** Options for `writeStream.format("kafka")` / `write.format("kafka")`
    * (the connector jar plugs in on a cluster; record assembly above is
    * what this environment can exercise end-to-end). */
  def sinkOptions(servers: String, checkpoint: Option[String] = None)
      : Map[String, String] =
    Map("kafka.bootstrap.servers" -> servers) ++
      checkpoint.map("checkpointLocation" -> _)
}
