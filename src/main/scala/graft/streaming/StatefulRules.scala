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
    * not all accounts ever seen. */
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
            state.setTimeoutTimestamp(math.max(next.frozenUntilMs, lastMs + freezeMs))
            alerts.iterator
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
        && col("ts_b") >= col("ts_a")
        && col("ts_b") <= col("ts_a") + expr("INTERVAL 1 HOUR"))
      .select(col("uid_a").as("user_id"), col("city_a"), col("ts_a"),
        col("city_b"), col("ts_b"))
  }
}
