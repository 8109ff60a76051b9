package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` schema. The reference has
  * no streaming support at all (SURVEY.md §1.1: spark-streaming is pulled
  * by its pom but never imported); this module adds the streaming analog of
  * the batch event queries so the same transforms run via `readStream` →
  * `writeStream`:
  *
  *  - [[windowedStats]]: watermarked tumbling-window aggregation, the
  *    standard streaming shape (works identically on a batch frame);
  *  - [[sessionCounts]]: custom per-key state via `mapGroupsWithState` —
  *    gap-based sessionization with the same 30-minute rule as the batch
  *    q17_sessionize.
  *
  * Scale: both are keyed-state operators — state is partitioned by group
  * key across executors; the watermark bounds state retention.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double)

  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  final case class SessionState(lastTs: Long, sessions: Long, events: Long)

  val GapNs: Long = 30L * 60L * 1000000000L

  /** Tumbling 1-hour windows of event counts + value sums. `events` may
    * carry `ts` in any corpus encoding [[graft.Tables.normalizeEventTime]]
    * accepts (TIMESTAMP_NTZ today, long nanos historically) — schema
    * dispatch works identically on batch and streaming frames. Spark's
    * watermark machinery demands an instant-typed (TIMESTAMP) event-time
    * column, so the normalized NTZ value is cast under the project's
    * pinned UTC session timezone. */
  def windowedStats(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    graft.Tables.normalizeEventTime(events)
      .withColumn("ts_evt", col("ts").cast("timestamp"))
      .withWatermark("ts_evt", watermark)
      .groupBy(window(col("ts_evt"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Typed event view for [[sessionCounts]]: `ts` normalized to epoch
    * nanos regardless of the corpus encoding. */
  def asEvents(events: DataFrame): Dataset[Event] = {
    import events.sparkSession.implicits._
    graft.Tables.normalizeEventTime(events)
      .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
  }

  final case class SessionOut(user_id: Long, start_ns: Long, end_ns: Long,
      n_events: Long)

  final case class OpenSession(start: Long, last: Long, n: Long)

  /** CLOSED sessions as an append stream — the true streaming sessionizer:
    * `flatMapGroupsWithState` in Append mode with EVENT-TIME timeouts. A
    * session is emitted when the gap rule closes it inside a batch, or
    * when the WATERMARK passes its last event + gap (the state timeout
    * fires — no new event needed). The instant-typed event-time column and
    * the watermark are derived internally from the Event's nanos `ts`.
    *
    * State per user is ONE open session (three longs), bounded by key
    * cardinality and watermark retention — the 100 TB shape. The price of
    * that bound is cross-batch reordering: an event within the gap of the
    * open interval widens it (start = min, last = max); an event older
    * than start − gap belongs to an EARLIER session the state no longer
    * holds and is emitted immediately as its own single-event session
    * (best effort — `session_window` buffers every open window to merge
    * these exactly, at strictly larger state). Within a batch events are
    * sorted first, so ordering costs nothing there. */
  def closedSessions(events: Dataset[Event],
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val withTime = events.toDF()
      // integer division — a double intermediate would lose precision on
      // epoch-nanos magnitudes
      .withColumn("ts_evt", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_evt", watermark)
      .as[EventWithTime]
    withTime
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, it, state: GroupState[OpenSession]) =>
          if (!it.hasNext && state.hasTimedOut) {
            // watermark passed last + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.last, s.n))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts > s.last + GapNs =>
                  // a gap after the interval closes the session
                  closed += SessionOut(user, s.start, s.last, s.n)
                  open = Some(OpenSession(e.ts, e.ts, 1L))
                case Some(s) if e.ts < s.start - GapNs =>
                  // cross-batch straggler from an already-forgotten earlier
                  // session: emit it alone, keep the open session intact
                  closed += SessionOut(user, e.ts, e.ts, 1L)
                case Some(s) =>
                  // inside (or gap-adjacent to) the open interval — widen;
                  // a delayed event must never REGRESS `last`
                  open = Some(OpenSession(math.min(s.start, e.ts),
                    math.max(s.last, e.ts), s.n + 1))
                case None =>
                  open = Some(OpenSession(e.ts, e.ts, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire when the watermark passes the gap after the last event
              state.setTimeoutTimestamp(s.last / 1000000L + GapNs / 1000000L)
            }
            closed.iterator
          }
      }
  }

  /** [[Event]] plus the instant-typed event-time column the watermark
    * machinery requires. */
  final case class EventWithTime(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double, ts_evt: java.sql.Timestamp)

  /** STREAM-STREAM interval join: purchases attributed to any click by
    * the same user in the preceding `windowMicros` — Spark's native
    * watermarked two-stream join (no custom state). Both inputs must be
    * STREAMING frames carrying `user_id`, `event_id` and an epoch-nanos
    * `ts` column (the [[Event]] shape).
    *
    * Semantics and scale:
    *  - INNER join ⇒ pairs emit EAGERLY on match (no watermark wait);
    *    the watermark exists to BOUND STATE: a buffered click is evicted
    *    once the watermark passes `click.ts + window` (it can no longer
    *    match), a buffered purchase once it passes `purchase.ts` — so
    *    state is O(events inside the watermark horizon), never O(stream
    *    history), the property that lets this run forever at 100 TB/day;
    *  - the join key is (user_id, time range): Spark hash-partitions
    *    both sides by user_id, so matching is executor-local;
    *  - a click and its purchase may arrive in DIFFERENT micro-batches
    *    (either order) — the state store carries the unmatched side
    *    across batches (StreamingSpec pins this).
    *
    * Returns (click_id, purchase_id, user_id, lat_us) — latency in exact
    * integer µs. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      windowMicros: Long = 3600L * 1000000L,
      watermark: String = "1 hour"): DataFrame = {
    def timed(df: DataFrame, pfx: String): DataFrame = df
      .withColumn(s"ts_$pfx", timestamp_micros(expr("ts div 1000")))
      .withWatermark(s"ts_$pfx", watermark)
      .select(col("event_id").as(s"${pfx}_id"),
        col("user_id").as(s"${pfx}_user"), col(s"ts_$pfx"))
    timed(clicks, "c").join(timed(purchases, "p"),
      expr(s"""c_user = p_user AND
               ts_p >= ts_c AND ts_p <= ts_c + INTERVAL ${windowMicros} MICROSECOND"""))
      .select(col("c_id").as("click_id"), col("p_id").as("purchase_id"),
        col("c_user").as("user_id"),
        (unix_micros(col("ts_p")) - unix_micros(col("ts_c"))).as("lat_us"))
  }

  /** Scale-adaptive STATE-partition count for a stateful streaming query
    * (guide §2: derive partitioning from input size — a constant tuned for
    * either local mode or the cluster is wrong at the other end). Every
    * stateful operator materializes ONE state store per shuffle partition
    * and pays a per-partition store commit EVERY micro-batch, so a
    * partition count sized for batch shuffle parallelism is pure
    * fixed overhead when the buffered state is small — and state size
    * tracks the INPUT inside the watermark horizon, not the cluster.
    * One partition per ~`graft.stream.stateTargetBytes` (default 32 MB)
    * of planned input, clamped to [1, session shuffle partitions]: a
    * 100 TB/day stream keeps the deployment's full parallelism (the cap),
    * a small replay drains through a handful of stores instead of paying
    * cores × operators × batches empty-store commits. Explicit override:
    * `graft.stream.statePartitions`. Size the BATCH view of the source
    * (streaming relations carry no stats). Partition count never changes
    * results — only where state rows live. */
  def statePartitions(s: SparkSession, sized: DataFrame*): Int =
    s.conf.getOption("graft.stream.statePartitions").map(_.toInt).getOrElse {
      val target = s.conf.getOption("graft.stream.stateTargetBytes")
        .map(_.toLong).getOrElse(32L * 1024 * 1024)
      val session = BigInt(s.conf.get("spark.sql.shuffle.partitions").toInt)
      val bytes = sized.map(_.queryExecution.optimizedPlan.stats.sizeInBytes).sum
      ((bytes / target + 1) min session max BigInt(1)).toInt
    }

  /** Run `body` with `spark.sql.shuffle.partitions` set to `n` (what a
    * NEW streaming query's checkpoint locks its state partitioning to),
    * restoring the session value after — so the override scopes to the
    * one stream start it wraps.
    *
    * SEQUENTIAL-CALLER CONTRACT (round-13 ADVICE): the override mutates
    * the SESSION conf for the duration of `body` (typically a
    * start().awaitTermination() drain), so any query planned concurrently
    * in the same session during that window would silently inherit the
    * clamped partition count. Re-binding the stream to a cloned session
    * is not safe here (newSession() does not carry the runtime catalog
    * confs the stream's table reads resolve through), so the guard below
    * refuses the override when other streams are already running on the
    * session — the concurrent-maintainer topology must size partitions
    * via the explicit `graft.stream.statePartitions` conf instead. */
  def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    require(s.streams.active.isEmpty,
      "graft: withStatePartitions mutates the session's shuffle-partition " +
        "conf and requires strictly sequential stream starts; " +
        s"${s.streams.active.length} stream(s) already active — set " +
        "graft.stream.statePartitions explicitly for concurrent topologies")
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Per-user session counts with a 30-minute inactivity gap, implemented
    * as explicit keyed state. Events within one micro-batch are sorted by
    * (ts, event_id) before folding; state carries the last timestamp across
    * batches. */
  def sessionCounts(events: Dataset[Event]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        (user, it, state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
          var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession = s.lastTs == Long.MinValue || e.ts - s.lastTs > GapNs
            s = SessionState(e.ts, s.sessions + (if (newSession) 1 else 0), s.events + 1)
          }
          state.update(s)
          UserSessions(user, s.sessions, s.events)
      }
  }
}
