package graft.streaming

import graft.schema.CustomerActivity
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The two genuinely stateful streaming rules (SURVEY §2.6 S5/S6).
  *
  * S5 — rule C3 (setupTables.py:33-34): a withdrawal exceeding the running
  * balance freezes the account for 24 h; activity during the freeze is
  * flagged. Custom per-key state with an event-time timeout —
  * `flatMapGroupsWithState`, the canonical Spark primitive for
  * suppress-with-timeout semantics.
  *
  * S6 — rule C1 (setupTables.py:31): same account in different cities
  * within an hour. Watermarked stream-stream self-join with a time-interval
  * condition; both sides carry watermarks so join state is bounded.
  */
object StatefulRules {

  /** Per-account state: exact cents (decimal(8,2) scales losslessly to
    * Long cents) + freeze horizon in epoch millis. */
  final case class AccountState(balanceCents: Long, frozenUntilMs: Long)

  /** Emitted alerts: kind = "freeze" (the violating debit) or "flagged"
    * (activity attempted while frozen). */
  final case class FreezeAlert(
      user_id: Int, ts: java.sql.Timestamp, kind: String,
      balanceCents: Long, attemptedCents: Long)

  val freezeMs: Long = 24L * 3600 * 1000

  /** The C3 transition function, factored out so the batch-equivalence test
    * can drive it directly: fold events (sorted by ts) through the account
    * state, emitting alerts. Monetary rules: CREDIT adds, DEBIT subtracts;
    * a DEBIT larger than the balance is rejected (not applied) and freezes
    * the account for 24 h from its event time; any activity strictly inside
    * the freeze window is flagged and not applied. NON_MONETARY rows only
    * ever get flagged. */
  def applyEvents(user: Int, sorted: Seq[CustomerActivity], init: AccountState)
      : (AccountState, Seq[FreezeAlert]) = {
    var st = init
    val out = Seq.newBuilder[FreezeAlert]
    sorted.foreach { e =>
      val cents = e.monetary_value.movePointRight(2).longValueExact()
      val t = e.ts.getTime
      if (t < st.frozenUntilMs) {
        out += FreezeAlert(user, e.ts, "flagged", st.balanceCents, cents)
      } else e.transaction_type match {
        case "CREDIT" => st = st.copy(balanceCents = st.balanceCents + cents)
        case "DEBIT" =>
          if (cents > st.balanceCents) {
            out += FreezeAlert(user, e.ts, "freeze", st.balanceCents, cents)
            st = st.copy(frozenUntilMs = t + freezeMs)
          } else st = st.copy(balanceCents = st.balanceCents - cents)
        case _ => () // NON_MONETARY / quarantined types: no balance effect
      }
    }
    (st, out.result())
  }

  /** S5 — streaming C3. Requires a watermark on `ts` upstream. State per
    * key is two longs; the event-time timeout clears state for accounts
    * idle past the freeze horizon, so state size tracks *active* accounts,
    * not all accounts ever seen.
    *
    * ORDERING TRADE (stated, like S8/S11/S12's bounded-state trades):
    * events are sorted by event time only WITHIN each micro-batch — a
    * late-but-in-watermark event delivered in a LATER batch is folded
    * after events that followed it in event time, so the fold can diverge
    * from the batch-order `applyEvents` replay (e.g. a late credit that
    * would have prevented a freeze arrives after the freeze fired; the
    * alert stands). Exactly-batch-equivalent ordering would require
    * buffering every event until the watermark passes it (state = the
    * whole in-flight window, plus a full per-key sort per trigger) —
    * a real cost the reference's own streaming rule does not pay either.
    * The S6 equivalence test therefore drives IN-ORDER batches; the same
    * trade applies to funnelAdvances (S10) below. */
  def freezeAlerts(activity: Dataset[CustomerActivity])
      : Dataset[FreezeAlert] = {
    import activity.sparkSession.implicits._
    activity
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AccountState, FreezeAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Int, events: Iterator[CustomerActivity],
         state: GroupState[AccountState]) =>
          if (state.hasTimedOut) {
            // Idle past the horizon: no pending freeze can still matter.
            state.remove()
            Iterator.empty
          } else {
            val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.feature_used))
            val (next, alerts) =
              applyEvents(user, sorted, state.getOption.getOrElse(AccountState(0L, 0L)))
            state.update(next)
            // Keep state while a freeze could still suppress activity;
            // otherwise expire once the watermark moves 24 h past the last
            // event (a re-activated account simply restarts from zero —
            // same as the reference, whose balance rule is per-history).
            val lastMs = sorted.lastOption.map(_.ts.getTime).getOrElse(0L)
            // Clamp above the current watermark: a batch of only-late events
            // could otherwise compute a timeout at-or-below the watermark,
            // which Spark rejects with IllegalArgumentException.
            state.setTimeoutTimestamp(math.max(
              math.max(next.frozenUntilMs, lastMs + freezeMs),
              state.getCurrentWatermarkMs() + 1))
            alerts.iterator
          }
      }
  }

  /** One funnel event (the `events` table shape, minus unused columns). */
  final case class FunnelEvent(
      user_id: Long, event_id: Long, ts: java.sql.Timestamp, event_type: String)

  /** Per-user funnel state: entry epoch-millis per stage, -1 = not reached.
    * Three longs per ACTIVE user — the streaming counterpart of d48's
    * per-user aggregates. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)

  /** Emitted when a user ADVANCES a stage (1 = view, 2 = click after view,
    * 3 = purchase after click) — the incremental form of the d48 batch
    * funnel: counting stage-k advances over a drained stream equals the
    * batch query's stage-k user count. */
  final case class FunnelAdvance(user_id: Long, stage: Int, ts: java.sql.Timestamp)

  /** The funnel transition function, factored out for the batch-equivalence
    * test: fold (ts, event_id)-ordered events through the stage state.
    * Ordering rule matches d48 exactly: a stage-k event counts only if
    * STRICTLY after the user's stage-(k-1) entry. */
  def applyFunnel(user: Long, sorted: Seq[FunnelEvent], init: FunnelState)
      : (FunnelState, Seq[FunnelAdvance]) = {
    var st = init
    val out = Seq.newBuilder[FunnelAdvance]
    sorted.foreach { e =>
      val t = e.ts.getTime
      e.event_type match {
        case "view" if st.t1 < 0 =>
          st = st.copy(t1 = t); out += FunnelAdvance(user, 1, e.ts)
        case "click" if st.t1 >= 0 && st.t2 < 0 && t > st.t1 =>
          st = st.copy(t2 = t); out += FunnelAdvance(user, 2, e.ts)
        case "purchase" if st.t2 >= 0 && st.t3 < 0 && t > st.t2 =>
          st = st.copy(t3 = t); out += FunnelAdvance(user, 3, e.ts)
        case _ => ()
      }
    }
    (st, out.result())
  }

  /** S10 — streaming conversion funnel: per-user stage machine via
    * mapGroups-with-state. State is three longs per active user, expired by
    * an event-time timeout (the same pattern as S5): once the watermark
    * moves `horizonMs` past a user's last event, the state is removed —
    * a completed user's terminal state (t3 set, can never emit again) and
    * a stale abandoner both cost nothing forever after, so state size
    * tracks users ACTIVE within the horizon, not all users ever seen.
    * Requires a watermark on `ts` upstream. A user who returns after
    * expiry restarts the funnel from stage 1 — the standard attribution-
    * window semantics (a conversion more than `horizonMs` after the last
    * touch is a new journey). */
  def funnelAdvances(events: Dataset[FunnelEvent],
                     horizonMs: Long = 7L * 24 * 3600 * 1000)
      : Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // No activity inside the horizon: completed or abandoned either
            // way, the journey is over.
            state.remove()
            Iterator.empty
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val (next, advances) = applyFunnel(user, sorted,
              state.getOption.getOrElse(FunnelState(-1L, -1L, -1L)))
            state.update(next)
            val lastMs = sorted.lastOption.map(_.ts.getTime).getOrElse(0L)
            // Clamped above the watermark for the same reason as S5: a
            // micro-batch of only-late events must not set a timeout the
            // watermark has already passed.
            state.setTimeoutTimestamp(math.max(
              lastMs + horizonMs, state.getCurrentWatermarkMs() + 1))
            advances.iterator
          }
      }
  }

  /** S6 — streaming C1 city-hop: self-join of the watermarked stream with
    * a 1-hour interval condition. Both inputs must be `withWatermark`'d
    * streams over activity rows; Spark bounds join state from the interval
    * + watermark. Returns (user_id, city_a, ts_a, city_b, ts_b). */
  def cityHop(left: DataFrame, right: DataFrame): DataFrame = {
    val a = left.select(col("user_id").as("uid_a"), col("city").as("city_a"),
      col("ts").as("ts_a"))
    val b = right.select(col("user_id").as("uid_b"), col("city").as("city_b"),
      col("ts").as("ts_b"))
    a.join(b,
      col("uid_a") === col("uid_b")
        && col("city_a") =!= col("city_b")
        // same pair predicate as the batch C1 rule (BatchRules.cityHop):
        // a simultaneous different-city pair — the strongest C1 signal —
        // is emitted exactly once via the city tiebreak; plain >= emitted
        // both orderings, plain > dropped the pair entirely, and either
        // would silently diverge from the batch twin the S6 test pins
        && (col("ts_b") > col("ts_a")
          || (col("ts_b") === col("ts_a") && col("city_a") < col("city_b")))
        && col("ts_b") <= col("ts_a") + expr("INTERVAL 1 HOUR"))
      .select(col("uid_a").as("user_id"), col("city_a"), col("ts_a"),
        col("city_b"), col("ts_b"))
  }
}
