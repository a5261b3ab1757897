package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Closed session emitted once its gap can no longer be bridged. */
case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
                      start_us: Long, end_us: Long, qsum: Long)

/** Per-user sessionization state: the next session ordinal to assign and
  * the still-open sessions as (start_us, end_us, n_events, qsum). More
  * than one session can be open at once under out-of-order arrival inside
  * the watermark horizon; they merge when a bridging event lands.
  */
case class SessionState(nextIdx: Long, open: List[(Long, Long, Long, Long)])

/** Streaming gap sessionization — the cross-batch counterpart of
  * EventOps.sessionize, built on `flatMapGroupsWithState` with an
  * event-time timeout (the custom-state Structured Streaming surface; the
  * contour carry uses the same pattern for ring state).
  *
  * Semantics: identical to the batch operator — events of one user whose
  * neighbours are more than `gapUs` apart split sessions; a session is
  * EMITTED (append mode, final) only when the watermark has passed its
  * end by more than the gap, so no future in-horizon event can extend or
  * merge it. Out-of-order events within the horizon are exact: state
  * keeps every open session and a bridging event merges its overlap set.
  * Session ordinals are exact too — closed sessions of one user emit in
  * chronological order (disjoint open sessions are gap-separated, so
  * min-end == min-start closes first), and `nextIdx` persists across
  * batches.
  *
  * State is BOUNDED: open sessions only (closed ones leave state), and
  * the event-time timeout fires exactly when the earliest open session
  * becomes closable, so idle users' state drains without new input.
  * Events later than the watermark horizon are dropped by the watermark
  * upstream — the same explicit trade StreamingDedup documents.
  */
object StreamingSessionize {

  private val Q20 = 1048576.0

  /** @param events streaming frame with (user_id, ts: timestamp, value)
    * @param gapUs  session gap in microseconds (default 30 min)
    * @param horizon watermark delay bounding disorder; "0 seconds" means
    *                event time is monotone per trigger
    */
  def sessionize(events: DataFrame, gapUs: Long = 1800000000L,
                 horizon: String = "30 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", horizon)
      // the watermarked ts column must survive projection for the
      // event-time timeout; us is its exact microsecond reading
      .select(col("user_id").cast("long"), col("ts"), unix_micros(col("ts")).as("us"),
        floor(col("value") * Q20).cast("long").as("qv"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        process(gapUs))
  }

  private def process(gapUs: Long)(user: Long,
                                   it: Iterator[(Long, java.sql.Timestamp, Long, Long)],
                                   state: GroupState[SessionState]): Iterator[SessionOut] = {
    val st = state.getOption.getOrElse(SessionState(1L, Nil))
    var open = st.open
    it.foreach { case (_, _, us, qv) =>
      // merge the event with every open session it can bridge to (an event
      // within gap of two sessions joins them)
      val (touch, rest) = open.partition { case (s, e, _, _) =>
        us >= s - gapUs && us <= e + gapUs
      }
      val s0 = (us :: touch.map(_._1)).min
      val e0 = (us :: touch.map(_._2)).max
      open = (s0, e0, touch.map(_._3).sum + 1L, touch.map(_._4).sum + qv) :: rest
    }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    // closable: no event at-or-after the watermark can be within gap of it
    val (closed, still) = open.partition { case (_, e, _, _) => e + gapUs < wmUs }
    val emitted = closed.sortBy(_._1).zipWithIndex.map { case ((s, e, n, q), i) =>
      SessionOut(user, st.nextIdx + i, n, s, e, q)
    }
    if (still.nonEmpty) {
      state.update(SessionState(st.nextIdx + emitted.size, still))
      // fire exactly when the earliest open session becomes closable
      state.setTimeoutTimestamp((still.map(_._2).min + gapUs) / 1000L + 1L)
    } else if (emitted.nonEmpty || state.exists) {
      // ordinal LEDGER: session_idx is a per-user lifetime ordinal (the
      // batch contract), so the counter must outlive its sessions. This is
      // the one deliberately user-cardinality-bounded piece of state (a
      // single long per ever-active user, no timeout); callers that prefer
      // fully-draining state over exact ordinals can key sessions by
      // start_us instead.
      state.update(SessionState(st.nextIdx + emitted.size, Nil))
    }
    emitted.iterator
  }
}
