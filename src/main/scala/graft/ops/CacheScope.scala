package graft.ops

import org.apache.spark.sql.DataFrame

/** Owner handle for the internal caches an operator pins (LSH band
  * tables, occupancy-histogram joins, gram tables). These caches exist
  * because the operator's plan reads them from more than one side, and
  * the function cannot unpersist them itself — the returned plan
  * references them lazily.
  *
  * Gate/bench callers use the default `CacheScope.unmanaged`: caches
  * live until session end (fine for short-lived jobs). A long-lived
  * job passes its own scope and calls `release()` once the operator's
  * RESULT is materialized, so executor storage is never pinned past the
  * operator's lifetime.
  */
final class CacheScope private (track: Boolean) {
  def this() = this(true)

  private val acquired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val broadcasts =
    scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.broadcast.Broadcast[_]]

  /** Register a cached frame with this scope (no-op for `unmanaged`). */
  private[ops] def own(df: DataFrame): DataFrame =
    if (track) synchronized { acquired += df; df } else df

  /** Register a broadcast (centroid matrices, PQ codebooks) — they pin
    * executor memory until GC otherwise. No-op for `unmanaged`. */
  private[ops] def ownBroadcast[T](bc: org.apache.spark.broadcast.Broadcast[T])
      : org.apache.spark.broadcast.Broadcast[T] =
    if (track) synchronized { broadcasts += bc; bc } else bc

  /** Unpersist every cache and broadcast this scope owns. Call only
    * AFTER the operator's result has been materialized
    * (collected/written) — the result plan reads them lazily until then.
    * Idempotent. */
  def release(): Unit = synchronized {
    acquired.foreach(_.unpersist(blocking = false))
    acquired.clear()
    broadcasts.foreach(_.unpersist(blocking = false))
    broadcasts.clear()
  }

  /** Frames currently owned (test/introspection). */
  private[graft] def frames: Seq[DataFrame] = synchronized(acquired.toSeq)

  def size: Int = synchronized(acquired.size + broadcasts.size)
}

object CacheScope {
  /** Session-lifetime scope: nothing tracked, nothing ever released —
    * the historical default behavior for gates and one-shot jobs. */
  val unmanaged: CacheScope = new CacheScope(false)
}
