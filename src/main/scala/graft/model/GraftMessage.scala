package graft.model

/** The message record surfaced by the graft queue source — the
  * Spark-native equivalent of the reference's record surface
  * (solace-apache-beam-samples/.../common/SolaceTextRecord.java:18-55:
  * destination, expiration, messageId, priority, redelivered, replyTo,
  * receive/sender timestamps, sequenceNumber, timeToLive, properties,
  * payload).
  *
  * In Spark the natural shape is a DataFrame schema (see
  * [[graft.sources.GraftQueueSource.schema]]); these case classes are
  * the typed `Dataset` views produced by the mappers — the
  * `InboundMessageMapper<T>` equivalent, except mapping is a Catalyst
  * projection (codegen'd), not a per-record callback.
  */
final case class GraftTextRecord(
    queue: String,
    destination: String,
    message_id: Long,
    sender_ts: java.sql.Timestamp,
    receive_ts: java.sql.Timestamp,
    priority: Int,
    redelivered: Boolean,
    reply_to: String,
    sequence_number: Long,
    time_to_live: Long,
    text: String)

final case class GraftBytesRecord(
    queue: String,
    message_id: Long,
    payload: Array[Byte])

final case class DedupedMsg(queue: String, message_id: Long, text: String)

/** Typed view of a decoded GR binary record (protobuf-sample equiv). */
final case class GraftStructRecord(
    queue: String, message_id: Long, id: Long, value: Double, tag: String)
