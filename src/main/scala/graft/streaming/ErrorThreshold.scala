package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** K4 failure-threshold semantics: the reference emits an error event
  * only after 5 CONSECUTIVE poll failures for a user, and any success
  * resets the run (`producers/user_positions_tracker.py:134-151`) — not
  * one event per failed row. Same shape as Lifecycle: a pure run-length
  * core all clock/order values are passed into, wrapped by
  * `flatMapGroupsWithState` keyed by the probe key.
  *
  * Scale: state is one Int per key with consecutive failures — O(active
  * failing keys), partitioned by the groupByKey shuffle; keys emit and
  * reset at the threshold so state never grows with failure count.
  */
object ErrorThreshold {

  /** Reference threshold (`user_positions_tracker.py:139`). */
  val DefaultThreshold = 5

  final case class Probe(key: String, tsMs: Long, failed: Boolean)
  final case class RunState(consecutive: Int)
  final case class ErrorEvent(key: String, consecutive: Int, atMs: Long)

  /** Pure run-length step over ts-ordered probes: failures grow the run,
    * the run reaching `threshold` emits ONE event and resets (matching
    * the reference's notify-then-reset), success resets silently. */
  def step(state: RunState, probes: Seq[Probe],
           threshold: Int): (RunState, Seq[ErrorEvent]) =
    probes.foldLeft((state, Seq.empty[ErrorEvent])) { case ((st, out), p) =>
      if (!p.failed) (RunState(0), out)
      else {
        val run = st.consecutive + 1
        if (run >= threshold)
          (RunState(0), out :+ ErrorEvent(p.key, run, p.tsMs))
        else (RunState(run), out)
      }
    }

  /** Spark-4 `transformWithState` form of the same operator — the
    * next-gen keyed-state API (requires the RocksDB state store
    * provider). Two upgrades over the fMGWS form that matter at scale:
    * typed per-key `ValueState` lives in the store (not a single
    * serialized blob per key), and the TTL evicts state for keys that
    * simply stop arriving — unbounded key churn (users come and go)
    * cannot accumulate state forever even when no success row ever
    * shows up to clear it. */
  class ThresholdProcessor(threshold: Int, ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Probe, ErrorEvent] {
    @transient private var run: org.apache.spark.sql.streaming.ValueState[RunState] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      run = getHandle.getValueState[RunState]("run",
        Encoders.product[RunState],
        org.apache.spark.sql.streaming.TTLConfig(ttl))
    override def handleInputRows(key: String, rows: Iterator[Probe],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[ErrorEvent] = {
      val st = if (run.exists()) run.get() else RunState(0)
      val (ns, out) = step(st, rows.toSeq.sortBy(_.tsMs), threshold)
      // run 0 ≡ absent (see fMGWS form)
      if (ns.consecutive == 0) run.clear() else run.update(ns)
      out.iterator
    }
  }

  /** [[run]] on `transformWithState`: same pure `step` core, store-native
    * state with TTL eviction. */
  def runTws(probes: Dataset[Probe], threshold: Int = DefaultThreshold,
             ttl: java.time.Duration = java.time.Duration.ofDays(1)): Dataset[ErrorEvent] = {
    implicit val ee = Encoders.product[ErrorEvent]
    probes.groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new ThresholdProcessor(threshold, ttl),
        // TTL is clock-based state expiry → the store needs a time mode
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Streaming wrapper: keyed consecutive-failure detection. */
  def run(probes: Dataset[Probe],
          threshold: Int = DefaultThreshold): Dataset[ErrorEvent] = {
    implicit val ee = Encoders.product[ErrorEvent]
    implicit val ke = Encoders.STRING
    probes.groupByKey(_.key)
      .flatMapGroupsWithState[RunState, ErrorEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[Probe], gs: GroupState[RunState]) =>
          val st = gs.getOption.getOrElse(RunState(0))
          val (ns, out) = step(st, it.toSeq.sortBy(_.tsMs), threshold)
          // run 0 ≡ absent: never store it, so the state map holds only
          // keys with an open failure run
          if (ns.consecutive == 0) { if (gs.exists) gs.remove() }
          else gs.update(ns)
          out.iterator
      }(Encoders.product[RunState], ee)
  }
}
