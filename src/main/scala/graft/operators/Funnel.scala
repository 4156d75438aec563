package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral-analytics aggregates (ClickHouse `windowFunnel` /
  * `retention` — the funnel surface a CH analytics user reaches for
  * over an events table).
  *
  * Scale posture: events are FILTERED to condition matches at scan
  * stage before anything shuffles — the one shuffle is the per-user
  * aggregate over matching events only (CH buffers the same per-group
  * state). The chain scan runs over each user's sorted match list with
  * higher-order functions; per-user arrays are bounded by that user's
  * matching events, the same memory contract as CH's AggregateFunction
  * buffer.
  */
object Funnel {

  /** CH `windowFunnel(window)(ts, cond1, …, condN)`: per group, the
    * length of the longest condition-chain prefix completed in order
    * within `windowSec` seconds of the chain's starting cond1 event.
    *
    * Algorithm (= CH's): process matches in (ts, condition index)
    * order, keeping per level the chain-start timestamp that reached
    * it. A cond1 match restarts the chain start (latest wins — starts
    * are non-decreasing, so a later start never loses a reachable
    * chain); a cond-k match extends level k-1's chain iff it falls
    * within the window of that chain's start. Events may satisfy
    * several conditions; each match participates at its own level,
    * ties resolve by condition index like CH's (timestamp, event_idx)
    * sort.
    *
    * Returns one row per group: (groupCol, level) with level in 0..N.
    * Groups with no matching events at all are absent (level-0 by
    * definition); left-join against the group universe to materialize
    * them.
    */
  def windowFunnel(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      windowSec: Long,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty && conds.size <= 32, "1..32 funnel conditions")
    val n = conds.size
    // per event: the list of condition indices it satisfies
    val idxs = array(conds.zipWithIndex.map { case (c, i) =>
      when(c, lit(i)).otherwise(lit(-1))
    }: _*)
    val matched = df
      .select(
        col(groupCol).as("_g"),
        col(tsCol).cast("long").as("_t"),
        idxs.as("_is"))
      .filter(col("_t").isNotNull)
      .select(col("_g"), col("_t"),
        explode(filter(col("_is"), x => x >= 0)).as("_i"))
    val scanned = matched
      .groupBy("_g")
      // lexicographic struct sort = CH's (timestamp, event_idx) order
      .agg(array_sort(collect_list(struct(col("_t"), col("_i")))).as("_ev"))
      .select(col("_g"),
        aggregate(
          col("_ev"),
          array_repeat(lit(-1L), n),
          (acc, e) => {
            val t = e.getField("_t")
            val i = e.getField("_i")
            transform(acc, (x, j) =>
              when(j =!= i, x).otherwise(
                when(i === 0, t) // chain restart: latest cond1 wins
                  .otherwise(
                    // element_at is 1-based: element_at(acc, j) = level j-1
                    when(element_at(acc, j) >= 0 &&
                        t <= element_at(acc, j) + windowSec,
                      element_at(acc, j))
                      .otherwise(x))))
          }).as("_chain"))
    // levels fill contiguously from 0, so the level is the set count
    scanned.select(col("_g"),
      size(filter(col("_chain"), x => x >= 0)).cast("int").as("level"))
  }

  /** CH `sequenceMatch('(?1).*(?2)…')(ts, cond1, …, condN)` for the
    * ordered-existence pattern family (conditions separated by `.*` —
    * the common decontamination/funnel spelling): true iff the group's
    * events contain a cond1 match, then later (or same-instant, CH tie
    * order) a cond2 match, and so on. Exactly [[windowFunnel]] with an
    * unbounded window reaching the final level. Returns
    * (groupCol, matched: boolean); groups with no matching events are
    * absent like windowFunnel's. */
  def sequenceMatchOrdered(
      df: DataFrame,
      groupCol: String,
      tsCol: String,
      conds: Seq[Column]): DataFrame =
    windowFunnel(df, groupCol, tsCol, windowSec = Long.MaxValue / 4, conds)
      .select(col("_g"), (col("level") === conds.size).as("matched"))

  /** CH `retention(cond1, …, condN)`, summed across groups: r1 = number
    * of groups where cond1 ever held; rk = number of groups where BOTH
    * cond1 and condk held (CH's per-group 0/1 array, aggregated).
    * Everything is plain conditional max/sum aggregates — two-phase,
    * map-side combined, no custom state. */
  def retentionCounts(
      df: DataFrame,
      groupCol: String,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "retention needs at least one condition")
    val flags = df.groupBy(col(groupCol).as("_g"))
      .agg(
        conds.zipWithIndex.map { case (c, i) =>
          max(when(c, 1).otherwise(0)).as(s"_c$i")
        }.head,
        conds.zipWithIndex.tail.map { case (c, i) =>
          max(when(c, 1).otherwise(0)).as(s"_c$i")
        }: _*)
    val rs = (0 until conds.size).map { i =>
      if (i == 0) sum(col("_c0")).cast("long").as("r1")
      else sum(col("_c0") * col(s"_c$i")).cast("long").as(s"r${i + 1}")
    }
    flags.agg(rs.head, rs.tail: _*)
  }
}
