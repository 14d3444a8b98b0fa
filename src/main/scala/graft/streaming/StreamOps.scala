package graft.streaming

import graft.core.Cols._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Typed event record for the stateful operators. */
case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Per-user session state carried across micro-batches. */
case class SessionState(lastTsUs: Long, sessions: Long, events: Long)

/** Open-session state for the completed-session emitter. */
case class OpenSession(startUs: Long, lastTsUs: Long, events: Long)

/** One finalized session emitted by `completedSessions`. */
case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_ev: Long)

/** Event with the value pre-encoded as exact integer ten-thousandths
  * (x54's fixed-point encoding, applied BEFORE the typed boundary so
  * the rounding is the same codegen'd `round` the batch query uses). */
case class VEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long, v: Long)

/** Trailing-window state for the anomaly detector: the user's last
  * ≤ 24 values in event order — a fixed ≤ 200-byte record per user. */
case class Trail(vs: Seq[Long])

/** One flagged anomaly (x54's output row). */
case class AnomalyOut(event_id: Long, user_id: Long, ts_us: Long, v: Long, n: Long)

/** Edge-alert state: the user's previous value (valid iff seen). */
case class LastV(v: Long, seen: Boolean)

/** One upward-crossing alert emitted by `edgeAlerts`. */
case class AlertOut(event_id: Long, user_id: Long, ts_us: Long, v: Long)

/** Per-user rollup emitted by the stateful session counter. */
case class UserSessions(user_id: Long, sessions: Long, events: Long)

/** Structured-Streaming operator surface. Each transform takes an
  * unbounded events DataFrame (schema of the `events` table: event_id,
  * ts, user_id, event_type, value) from any `readStream` source and
  * produces the streaming form of the S1-S4 semantics. The batch forms
  * in StreamingQueries are the oracle-checked equivalents; the test
  * suite asserts streaming == batch over the same input.
  *
  * State design (100 TB / unbounded): all aggregations key on low-
  * cardinality columns (window x event_type, user_id), watermarks bound
  * state (30 min), and session state is per-user only — the shapes
  * SURVEY.md §7 calls for.
  */
object StreamOps {

  /** S1: tumbling 1-hour counts/sums per event_type (complete/update mode). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), (sum(fixed(col("value"), 10000)) / 10000.0).as("val"))
      .select(epochUs(col("w.start")).as("ws_us"), col("event_type"), col("cnt"), col("val"))

  /** S1 with watermark, for append-mode sinks: late data beyond 30 min
    * is dropped and finalized windows are emitted exactly once. */
  def tumblingWithWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), (sum(fixed(col("value"), 10000)) / 10000.0).as("val"))
      .select(epochUs(col("w.start")).as("ws_us"), col("event_type"), col("cnt"), col("val"))

  /** S2: sliding 1-hour window every 15 minutes. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), (sum(fixed(col("value"), 10000)) / 10000.0).as("val"))
      .select(epochUs(col("w.start")).as("ws_us"), col("event_type"), col("cnt"), col("val"))

  /** S3: 30-minute-gap session windows per user (session-level rows;
    * the per-user rollup of StreamingQueries.s3 is a downstream agg). */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        (epochUs(max(col("ts"))) - epochUs(min(col("ts")))).as("dur_us"),
        sum(fixed(col("value"), 10000)).as("vc"))
      .select(col("user_id"), col("n_ev"), col("dur_us"), (col("vc") / 10000.0).as("val"))

  /** Stream-stream interval self-join — the streaming form of R6's
    * range join: pairs of events of the same user at most 1 hour apart
    * (id1 < id2 de-dupes the symmetric match). Both inputs carry a
    * 30-minute watermark and the join condition bounds EVENT TIME on
    * both sides — the two things Spark's stream-stream join needs to
    * expire buffered rows: a row can leave the join state as soon as
    * the other side's watermark passes its ts + 1 hour, so state holds
    * a ~90-minute sliding slice of each stream regardless of total
    * volume (the property that makes the join viable on an unbounded
    * feed). Inner join: matches emit as soon as both rows have
    * arrived; nothing waits for the watermark. */
  def eventPairs(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("u1"), col("ts").as("ts1"), col("event_id").as("id1"))
    val r = right.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("u2"), col("ts").as("ts2"), col("event_id").as("id2"))
    l.join(r,
      col("u1") === col("u2") &&
        col("ts2") >= col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 1 HOUR") &&
        col("id1") < col("id2"))
      .select(col("u1").as("user_id"), col("id1"), col("id2"))
  }

  /** Left-outer stream-stream interval join — eventPairs' semantics
    * plus "tell me about the events that never found a partner": a
    * left event with no same-user successor inside 1 hour is emitted
    * with a null right side. Inner matches emit eagerly as in
    * eventPairs; the UNMATCHED rows are watermark-driven — Spark can
    * only declare "no partner will ever arrive" once the right-side
    * watermark passes the left row's last possible match time
    * (ts1 + 1 hour), at which point the buffered row is evicted and
    * emitted null-padded. State is the same bounded ~90-minute slice
    * per side as the inner join; the left-outer flavor adds no state,
    * only the deferred emission. The tail consequence (left rows whose
    * match window the final watermark never passes stay in state,
    * unemitted) is part of the declared semantics and is what the
    * gated query's oracle models. */
  def eventPairsLeftOuter(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("u1"), col("ts").as("ts1"), col("event_id").as("id1"))
    val r = right.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("u2"), col("ts").as("ts2"), col("event_id").as("id2"))
    l.join(r,
      col("u1") === col("u2") &&
        col("ts2") >= col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 1 HOUR") &&
        col("id1") < col("id2"),
      "leftOuter")
      .select(col("u1").as("user_id"), col("id1"),
        // -1 sentinel instead of NULL: the cross-engine hash gate
        // compares sorted rows, and NULL ordering is the one place
        // ANSI engines legitimately differ (Spark NULLS FIRST vs
        // DuckDB NULLS LAST on ASC) — an integer sentinel removes
        // the divergence without weakening the row content.
        coalesce(col("id2"), lit(-1L)).as("id2"))
  }

  /** Cumulative per-(user, event_type) totals for the update-mode
    * upsert sink (s11). No watermark: update mode re-emits a key's NEW
    * cumulative row whenever a micro-batch touches it, which is
    * exactly what an upsert target wants. State is keyed by
    * (user_id, event_type) — the aggregate's own cardinality, not the
    * stream's; a production deployment bounds it with a watermark +
    * window key when keys are unbounded. Integer ten-thousandths keep
    * the sum exact in any accumulation order. */
  def keyedTotals(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(fixed(col("value"), 10000)).as("val_10k"))

  /** Stream-static enrichment join: attach a dimension row (here the
    * customer's market segment, user_id = c_custkey) to every event.
    * The static side is broadcast — no shuffle of the stream, no state
    * at all (the dimension is re-read per micro-batch, so a slowly-
    * changing dim picks up updates between batches). The standard shape
    * for decorating a 100 TB/day feed with reference data. */
  def enriched(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
      broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
      col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("c_mktsegment"))

  /** Streaming exact dedup by event_id — the pipeline's "drop replayed
    * events" stage. State is bounded by the watermark: an id is
    * remembered only until its event time falls behind the 30-minute
    * watermark, so state size tracks the late-data horizon, not the
    * stream's history — the property that keeps this viable on an
    * unbounded 100 TB/day feed (dropDuplicates without the watermark
    * variant would grow state forever). */
  def dedupe(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** S18: TWO stateful operators chained in one streaming query —
    * watermark-scoped dedup feeding the finalized hourly aggregate.
    * This is the shape a real ingest pipeline wants (drop replays,
    * THEN count), and it only became expressible when multi-stateful
    * queries landed; before that the dedup and the aggregate had to be
    * separate queries with a sink between them. State: the dedup holds
    * ids inside the 30-minute horizon, the aggregate holds open
    * windows — both bounded by the watermark, independent of history. */
  def dedupedHourly(events: DataFrame): DataFrame =
    events.withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        (sum(fixed(col("value"), 10000)) / 10000.0).as("val"))
      .select(epochUs(col("w.start")).as("ws_us"), col("event_type"),
        col("cnt"), col("val"))

  /** S19: stream-stream LEFT SEMI interval join — "which events found
    * a same-user successor within the hour", emitting the LEFT row
    * once on its first match and nothing on eviction. Same bounded
    * ~90-minute per-side state as eventPairs; the semi flavor is what
    * a funnel trigger wants (fire on the first continuation, don't
    * enumerate all of them). Emission is match-driven (no
    * watermark-finalization term in the oracle): a left row either
    * meets a match — possibly in a later micro-batch, the join buffers
    * it until the right watermark passes ts1 + 1h — or silently
    * expires, so the emitted set equals the batch semi join however
    * the arrival was chunked. */
  def eventsWithPair(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("u1"), col("ts").as("ts1"),
        col("event_id").as("id1"), col("event_type"))
    val r = right.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("u2"), col("ts").as("ts2"), col("event_id").as("id2"))
    l.join(r,
      col("u1") === col("u2") &&
        col("ts2") >= col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 1 HOUR") &&
        col("id1") < col("id2"),
      "left_semi")
      .select(col("u1").as("user_id"), col("id1"),
        epochUs(col("ts1")).as("ts_us"), col("event_type"))
  }

  /** Custom state machine via mapGroupsWithState: per-user session
    * counting with the same 30-minute-gap rule as session_window, but
    * with explicit user-managed state — the KeyValueGroupedDataset
    * surface SURVEY.md §2B declares. State is one small record per
    * user (bounded), emitted as an updated rollup every micro-batch.
    * Assumes per-user in-order arrival (rows within a batch are sorted
    * here; cross-batch order is the source's contract). */
  def statefulSessionCounts(events: Dataset[Event]): Dataset[UserSessions] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[UserSessions]
    val gapUs = 30L * 60 * 1000000

    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000

    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val t = micros(e.ts)
            val newSession = st.lastTsUs == Long.MinValue || t - st.lastTsUs >= gapUs
            st = SessionState(t, st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          UserSessions(uid, st.sessions, st.events)
      }
  }

  /** flatMapGroupsWithState: emit each session AS IT COMPLETES, keeping
    * only the open session in state — append-mode-friendly, one small
    * state record per user. A session closes two ways: a newer event
    * arrives past the 30-minute gap, or the EVENT-TIME TIMEOUT fires —
    * the watermark passing lastTs + gap proves no in-gap event can
    * still arrive, so an idle user's final session is emitted and the
    * state entry removed. That timeout is what bounds state on an
    * unbounded feed (state tracks currently-active users, not all users
    * ever seen) and guarantees no session is withheld forever. The dual
    * of `statefulSessionCounts`, which re-emits a rollup every batch;
    * this shape is what a downstream training-data writer wants
    * (finalized, immutable session rows). Same in-order assumptions.
    *
    * ARRIVAL-ORDER CONTRACT (explicit): the in-stream close fires the
    * moment a past-gap event ARRIVES, before the watermark proves
    * finality. An out-of-order late event that would BRIDGE an
    * already-emitted session and the open one (session emitted on a
    * past-gap arrival, then an in-watermark event lands inside the
    * emitted session's gap) is NOT merged back — the emitted row is
    * immutable — so such arrival orders diverge from batch
    * `session_window`. Supported input is per-user non-decreasing
    * event time across micro-batches (in-batch disorder is fine — rows
    * are sorted before folding; a late event inside the OPEN session
    * is also fine — the min/max merge handles it). s6 feeds time-split
    * chunks precisely to honor this contract; a feed that cannot
    * guarantee it should use `sessions` (session_window) instead,
    * whose state merges windows until the watermark closes them. */
  def completedSessions(events: Dataset[Event]): Dataset[SessionOut] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    val gapUs = 30L * 60 * 1000000

    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000

    events.withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.startUs, s.lastTsUs, s.events))
          } else {
            val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
            var open = state.getOption
            it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val t = micros(e.ts)
              open match {
                case Some(s) if t - s.lastTsUs >= gapUs =>
                  out += SessionOut(uid, s.startUs, s.lastTsUs, s.events)
                  open = Some(OpenSession(t, t, 1L))
                case Some(s) =>
                  // min/max, not (startUs, t): a late event admitted by
                  // the 30-min watermark can carry t < s.lastTsUs, and
                  // moving lastTs backward would let a later event
                  // spuriously split the session vs batch session_window
                  open = Some(OpenSession(math.min(s.startUs, t),
                    math.max(s.lastTsUs, t), s.events + 1))
                case None =>
                  open = Some(OpenSession(t, t, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire once the watermark proves the gap elapsed; clamp
              // above the current watermark (Spark rejects earlier)
              state.setTimeoutTimestamp(
                math.max(s.lastTsUs / 1000 + gapUs / 1000,
                  state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }

  /** [[completedSessions]]' session logic re-expressed on the
    * transformWithState API (the arbitrary-state surface that
    * supersedes flatMapGroupsWithState): named typed state via a
    * StatefulProcessorHandle instead of one opaque GroupState blob,
    * explicit registered/deleted event-time TIMERS instead of the
    * single setTimeoutTimestamp slot, and a separate
    * handleExpiredTimer callback for the watermark-driven close.
    * Requires the RocksDB state store provider (the API's contract);
    * the s20 runner sets it on its child session. Emission semantics
    * are IDENTICAL to completedSessions by construction — s20 gates
    * that claim against s6's verbatim oracle. */
  class SessionCloseProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, SessionOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, _}
    @transient private var open: ValueState[OpenSession] = _
    private val gapUs = 30L * 60 * 1000000

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    private def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000

    override def handleInputRows(uid: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[SessionOut] = {
      val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
      var cur = if (open.exists()) Some(open.get()) else None
      rows.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val t = micros(e.ts)
        cur match {
          case Some(s) if t - s.lastTsUs >= gapUs =>
            out += SessionOut(uid, s.startUs, s.lastTsUs, s.events)
            cur = Some(OpenSession(t, t, 1L))
          case Some(s) =>
            // min/max — the completedSessions late-event rule
            cur = Some(OpenSession(math.min(s.startUs, t),
              math.max(s.lastTsUs, t), s.events + 1))
          case None =>
            cur = Some(OpenSession(t, t, 1L))
        }
      }
      cur.foreach { s =>
        open.update(s)
        // one live timer per key: drop stale ones, arm the gap close
        // (clamped above the current watermark, as the API requires
        // event-time timers to be)
        getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts.asInstanceOf[Long]))
        getHandle.registerTimer(
          math.max(s.lastTsUs / 1000 + gapUs / 1000,
            timers.getCurrentWatermarkInMs + 1))
      }
      out.iterator
    }

    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!open.exists()) Iterator.empty
      else {
        val s = open.get()
        open.clear()
        Iterator.single(SessionOut(uid, s.startUs, s.lastTsUs, s.events))
      }
    }
  }

  /** S20: completed sessions via transformWithState — see
    * [[SessionCloseProcessor]]. */
  def completedSessionsTws(events: Dataset[Event]): Dataset[SessionOut] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[SessionOut]
    events.withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionCloseProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** Streaming twin of x54's trailing-window anomaly detection: flag
    * any event whose value sits more than 3 sigma from its user's
    * trailing 24-event window (≥ 8 priors required), evaluated with
    * the same division- and sqrt-free integer test as the batch form —
    * (n·x − S)² > 9·(n·Q − S²) over exact ten-thousandths. Both
    * engines evaluate every term in INT64 (observed |v| reaches
    * ~4.9e6 ten-thousandths, so dev² reaches ~5.5e16 — beyond a
    * double's 2^52 exact-integer range but far inside 2^63; do NOT
    * refactor this test into floating point), so streamed and batch
    * flags are bit-identical. State is a per-user ring of the last ≤ 24 values —
    * a fixed ≤ 200-byte record per user, independent of stream length
    * (the telemetry shape: per-key bounded state, emit-on-flag).
    * Rows within a batch are sorted by (event time, id); cross-batch
    * per-user order is the source's contract (the gated run's
    * time-split chunks satisfy it by construction). NoTimeout: the
    * trail never expires — a user's baseline survives idle gaps, which
    * is what a telemetry monitor wants; state stays bounded because
    * the RECORD is bounded, not because keys die. */
  def anomalies(events: Dataset[VEvent]): Dataset[AnomalyOut] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[Trail]
    implicit val outEnc = Encoders.product[AnomalyOut]

    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Trail, AnomalyOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[VEvent], state: GroupState[Trail]) =>
          var buf = state.getOption.map(_.vs.toVector).getOrElse(Vector.empty[Long])
          val out = scala.collection.mutable.ListBuffer.empty[AnomalyOut]
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val n = buf.length.toLong
            if (n >= 8) {
              var s = 0L; var q = 0L
              buf.foreach { x => s += x; q += x * x }
              val dev = n * e.v - s
              if (dev * dev > 9L * (n * q - s * s))
                out += AnomalyOut(e.event_id, uid, micros(e.ts), e.v, n)
            }
            buf = (buf :+ e.v).takeRight(24)
          }
          state.update(Trail(buf))
          out.iterator
      }
  }

  /** Threshold EDGE alerting with episode suppression: emit one alert
    * per UPWARD CROSSING of the threshold — a user's value exceeding T
    * alerts only if their previous value was at or below T (or this is
    * their first event) — not on every elevated sample. The dedup that
    * separates an alerting pipeline from a spam generator, and the
    * minimal stateful-stream shape: state is ONE value per key (the
    * previous sample), so memory is exactly the key cardinality. Batch
    * twin: `lag(v) over (partition by user order by ts, id)` — the
    * gated run hash-matches that oracle. In-batch order restored by
    * sorting; cross-batch order is the arrival contract (time-split
    * chunks). */
  def edgeAlerts(events: Dataset[VEvent], threshold10k: Long): Dataset[AlertOut] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[LastV]
    implicit val outEnc = Encoders.product[AlertOut]

    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastV, AlertOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[VEvent], state: GroupState[LastV]) =>
          var last = state.getOption.getOrElse(LastV(0L, seen = false))
          val out = scala.collection.mutable.ListBuffer.empty[AlertOut]
          it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            if (e.v > threshold10k && (!last.seen || last.v <= threshold10k))
              out += AlertOut(e.event_id, uid, micros(e.ts), e.v)
            last = LastV(e.v, seen = true)
          }
          state.update(last)
          out.iterator
      }
  }
}
