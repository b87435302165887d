package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame

/** Dynamic schema resolution (SURVEY.md §1.2): the reference resolves
  * Avro schemas two ways — per message from the Schema Registry
  * (reference: main.py:6-9,22) or statically from a file
  * (reference: read_from_kafka.py:8). The engine's equivalents:
  *
  *  - plan-time resolution: fetch the subject's latest schema once and
  *    plan the decode with it ([[resolveAndDecode]]);
  *  - per-batch re-resolution for schema evolution: inside foreachBatch,
  *    re-fetch before decoding each micro-batch
  *    ([[decodeEachBatchWith]]) — new fields appear as soon as the
  *    registry serves the widened schema, without restarting the query.
  *
  * The trait is transport-agnostic; [[InMemorySchemaRegistry]] serves
  * tests and broker-less environments (a Confluent-REST-backed
  * implementation is a drop-in — same two calls the reference makes).
  */
trait SchemaRegistry {
  /** writer schema by registry id (the 4-byte wire-header id) */
  def schemaById(id: Int): Option[String]
  /** latest (id, schema) for a subject, e.g. "pg.public.users-value" */
  def latest(subject: String): Option[(Int, String)]
}

final class InMemorySchemaRegistry extends SchemaRegistry {
  private val byId = new ConcurrentHashMap[Int, String]()
  private val latestBySubject = new ConcurrentHashMap[String, Int]()

  def register(subject: String, id: Int, schemaJson: String): Unit = {
    byId.put(id, schemaJson)
    latestBySubject.put(subject, id)
  }

  override def schemaById(id: Int): Option[String] = Option(byId.get(id))
  override def latest(subject: String): Option[(Int, String)] =
    Option(latestBySubject.get(subject)).map(id => (id, byId.get(id)))
}

object SchemaRegistry {

  /** Plan-time resolution: decode a CDC record stream with the subject's
    * current latest schema (the registry is consulted once, at plan
    * time — the main.py mode with the registry cache warm). */
  def resolveAndDecode(records: DataFrame, registry: SchemaRegistry,
      topic: String): DataFrame = {
    val (_, schema) = registry.latest(s"$topic-value").getOrElse(
      throw new IllegalStateException(s"no schema for subject $topic-value"))
    KafkaCdc.decodeCdc(records, schema)
  }

  /** Evolution mode: re-resolve the schema per micro-batch so a widened
    * schema takes effect mid-stream. Use as the foreachBatch body:
    * {{{ stream.writeStream.foreachBatch(decodeEachBatchWith(reg, topic)(sink)) }}}
    */
  def decodeEachBatchWith(registry: SchemaRegistry, topic: String)(
      handle: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, id) => handle(resolveAndDecode(batch, registry, topic), id)
}
