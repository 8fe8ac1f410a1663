package graft.streaming

import org.apache.spark.sql.DataFrame

/** Bounded-state streaming exact dedup — the streaming counterpart of the
  * batch W1 window dedup (`Ingest.dedupLatest`) for at-least-once sources
  * (Kafka redeliveries, CDC snapshot/stream overlap).
  *
  * `dropDuplicatesWithinWatermark` keeps per-key state only until the
  * event-time watermark passes the key's first-seen timestamp + delay, so
  * state is O(keys per watermark horizon) — a plain `dropDuplicates` on a
  * stream retains every key ever seen and OOMs on an unbounded corpus.
  * This is the 100 TB-safe shape: the dedup horizon, not the stream
  * length, bounds executor state.
  */
object StreamDedup {

  /** @param tsCol event-time column the watermark rides on
    * @param delay watermark delay, e.g. "10 minutes" — duplicates arriving
    *   within this horizon of each other collapse to the first arrival
    * @param keys identity columns (e.g. the PK, or a content hash) */
  def withinWatermark(stream: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
}
