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

  /** Replay-safe evolution mode: decode each record with its WRITER
    * schema (looked up by the Confluent wire-header id — the header
    * exists precisely so consumers can do this), then project every
    * slice onto the subject's LATEST column set: a new nullable column
    * reads NULL for rows written under an older schema; a column the
    * latest schema dropped is appended (the sink simply stops updating
    * it — [[JdbcUpsertSink]]'s documented drop semantics).
    *
    * This is what makes a checkpoint REPLAY that spans a schema
    * evolution safe: after a crash the replayed batch still carries
    * old-id bytes while the registry already serves the widened schema
    * — decoding with latest-only ([[resolveAndDecode]]) would EOF
    * mid-record on the missing tail field. Tombstones (null values)
    * carry no writer id and ride the latest-schema slice.
    *
    * The distinct-id collect is bounded by the number of schema
    * VERSIONS in flight within one micro-batch (single digits for any
    * real subject), never by rows. */
  def resolveAndDecodeById(records: DataFrame, registry: SchemaRegistry,
      topic: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import graft.functions.AvroCodec
    val (_, latestSchema) = registry.latest(s"$topic-value").getOrElse(
      throw new IllegalStateException(s"no schema for subject $topic-value"))
    // materialize the micro-batch ONCE before slicing: the method runs
    // 2+N jobs over it (distinct-id collect, tombstone slice, one
    // filter per wire id) and without this the upstream source is
    // re-scanned per slice inside foreachBatch (r15 ADVICE). Eager
    // localCheckpoint both caches and cuts lineage, so each per-id
    // filter reads local blocks.
    val snap = records.localCheckpoint()
    val ids = snap.filter(col("value").isNotNull)
      .select(AvroCodec.confluentSchemaId(col("value")).as("sid"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
    // the latest-schema empty frame anchors column ORDER; tombstones
    // (null value) decode under any schema and ride this slice too
    val anchor = KafkaCdc.decodeCdc(snap.limit(0), latestSchema)
    val tombstones =
      KafkaCdc.decodeCdc(snap.filter(col("value").isNull), latestSchema)
    val slices = ids.map { id =>
      val writer = registry.schemaById(id).getOrElse(throw
        new IllegalStateException(s"registry has no schema for wire id $id"))
      KafkaCdc.decodeCdc(
        snap.filter(AvroCodec.confluentSchemaId(col("value")) === id),
        writer)
    }
    (anchor +: tombstones +: slices)
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }
}
