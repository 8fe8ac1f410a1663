package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SessionEvent(user: String, ts: java.sql.Timestamp)
case class SessionState(start: Long, end: Long, n: Int)
case class SessionOut(user: String, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, events: Int)

/** Gap-based sessionization with custom state (brief:
  * "KeyValueGroupedDataset.mapGroupsWithState/flatMapGroupsWithState for
  * custom state"): per-user sessions close after `gapMs` of event-time
  * silence, enforced by EventTimeTimeout against the watermark.
  *
  * State per key is one fixed-size SessionState (start/end/count) —
  * constant memory per user regardless of stream length, the property
  * that keeps stateful streaming viable at 100 TB/day.
  */
object Sessionize {

  def byGap(events: Dataset[SessionEvent], gapMs: Long,
      watermarkDelay: String = "1 minute"): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.STRING
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(gapMs))
  }

  private def process(gapMs: Long)(
      user: String, rows: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    def out(s: SessionState) = SessionOut(user,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n)

    if (state.hasTimedOut) {
      val closed = out(state.get)
      state.remove()
      Iterator.single(closed)
    } else {
      val evs = rows.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      for (e <- evs) {
        val t = e.ts.getTime
        cur = cur match {
          case Some(s) if t - s.end <= gapMs =>
            Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
          case Some(s) => // gap exceeded inside the batch: close + restart
            closed ::= out(s)
            Some(SessionState(t, t, 1))
          case None => Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end + gapMs)
      }
      closed.reverse.iterator
    }
  }
}
