package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic k-step funnel over an event log: the first completion of an
  * ordered chain of event types, each step within its own time window
  * of the previous step — the operator behind `q_funnel` (2 steps) and
  * `q_funnel_steps` (3 steps), for any chain.
  *
  * Shape and the 100 TB argument: a fold of user-keyed MIN-aggregations
  * and equi-joins with residual time bands. Step i's relation contains
  * only users who completed steps 0..i, so every successive shuffle
  * operates on a (typically sharply) SMALLER keyed relation; no window
  * function ever runs over the raw event stream, and the event scan is
  * re-used per step with its type filter pushed down to the parquet
  * scan. Ties inside a step resolve by `min(t)` — deterministic without
  * an id tiebreak because equal-time events are interchangeable at the
  * step level.
  *
  * Steps may REPEAT a type (a → b → a): columns are indexed `t0..tk−1`,
  * and step i matches events strictly AFTER step i−1's time, so a
  * repeated type needs a genuinely later event (FunnelSpec pins it).
  *
  * The streaming sibling is [[graft.streaming.FunnelStream]] (2-step,
  * one conversion row per user, O(users) state).
  */
object Funnel {

  /** First completion per user: `(user_id, t0, …, t{k−1})`, epoch
    * seconds. Input needs `user_id`, `event_type`, `t_sec`.
    *
    * @param steps   event types in funnel order (k ≥ 2)
    * @param windows max seconds from step i−1 to step i (length k−1)
    */
  def firstCompletion(ev: DataFrame, steps: Seq[String],
      windows: Seq[Long]): DataFrame = {
    require(steps.length >= 2, "a funnel needs at least two steps")
    require(windows.length == steps.length - 1,
      s"need one window per transition: ${steps.length - 1}, got ${windows.length}")
    require(windows.forall(_ > 0), "windows must be positive")
    val first = ev.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("t_sec")).as("t0"))
    steps.tail.zip(windows).zipWithIndex.foldLeft(first) {
      case (acc, ((step, win), i)) =>
        val prev = s"t$i"
        val keys = col("user_id") +: (0 to i).map(j => col(s"t$j"))
        ev.filter(col("event_type") === step)
          .join(acc, Seq("user_id"))
          .filter(col("t_sec") > col(prev) && col("t_sec") <= col(prev) + win)
          .groupBy(keys: _*)
          .agg(min(col("t_sec")).as(s"t${i + 1}"))
    }
  }
}
