package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the `events` table shape (event_id, ts,
  * user_id, event_type, value, props).
  *
  * Additive relative to the reference — BigHouse is read-only batch
  * OLAP with no streaming path (SURVEY §1.1: no INSERT anywhere) — but
  * designed Spark-first per SURVEY §7: `readStream` → declarative
  * transforms → `writeStream`, with event-time watermarks bounding
  * state so every operator here runs indefinitely on an unbounded
  * stream without unbounded memory. The same column expressions the
  * batch engine uses apply verbatim — one definition of the semantics,
  * two execution modes.
  */
object EventStreams {

  /** Stream the events table shape from a directory of parquet files
    * (file-arrival streaming — the classic landing-zone pattern). */
  def fromParquetDir(spark: SparkSession, dir: String, schemaFrom: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(schemaFrom).schema)
      .parquet(dir)

  /** Tumbling-window counts + value sums per event type, watermarked:
    * state for windows older than the watermark is dropped, so this
    * runs forever on a real stream. Late events beyond 10 minutes are
    * discarded — the documented trade. */
  def windowedCounts(events: DataFrame, window: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(
        org.apache.spark.sql.functions.window(col("ts"), window).as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("cnt"), col("cents"))

  /** Sliding-window event rate (1h window sliding every 15m). */
  def slidingRate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("cnt"))

  /** Stream-stream interval join: pair each left event with the right
    * events for the SAME user whose timestamp falls within
    * [left.ts, left.ts + `within`] — the attribution shape
    * (impression ⋈ click-within-N-minutes). Both sides are
    * watermarked, and the time-range condition bounds join state: a
    * buffered row is dropped once the other side's watermark passes
    * its interval, so state is (rate × (watermark + within)), never
    * stream length. Inner join; unmatched rows simply age out.
    * Returns (user_id, l_id, r_id, l_ts, r_ts).
    *
    * The same call works on two batch frames (the condition is plain
    * columns) — one definition, two execution modes, like the rest of
    * this module. */
  def intervalJoinStream(
      left: DataFrame,
      right: DataFrame,
      within: String = "15 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.select(col("user_id").as("l_user"),
      col("event_id").as("l_id"), col("ts").as("l_ts"))
    val r = right.select(col("user_id").as("r_user"),
      col("event_id").as("r_id"), col("ts").as("r_ts"))
    val (lw, rw) =
      if (left.isStreaming || right.isStreaming)
        (l.withWatermark("l_ts", watermark), r.withWatermark("r_ts", watermark))
      else (l, r)
    lw.join(rw,
        col("l_user") === col("r_user") &&
          col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select(col("l_user").as("user_id"),
        col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** Streaming exact dedup — the ingestion-time twin of
    * [[graft.operators.Dedup.exact]]: duplicates arriving within the
    * watermark horizon are dropped exactly once per key; state for
    * keys older than the watermark is reclaimed, so memory is bounded
    * by (arrival rate × watermark), not stream length. */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")

  /** Streaming NEAR-dup dedup: the ingestion-time twin of the batch
    * SimHash pipeline. Each document is keyed by its 64-bit SimHash
    * fingerprint (scan-stage expression, no shuffle before the dedup
    * state), so exact dups AND cosmetically-perturbed near-dups that
    * hash to the same fingerprint are dropped at ingest; state is
    * watermark-bounded like [[dedupStream]]. Hamming-radius matching
    * (fingerprints differing in ≤ k bits) needs the banded batch path
    * ([[graft.operators.Dedup.simHashDupPairs]]) — streaming keyed
    * state cannot join across keys, so ingest-time dedup trades recall
    * on that tail for O(rate × watermark) memory. */
  def nearDupDedupStream(
      docs: DataFrame,
      textCol: String,
      tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("_fp", graft.operators.Dedup.simHash(col(textCol)))
      .withWatermark(tsCol, watermark)
      // dedup on the fingerprint ALONE (a near-dup arrives at a
      // different event time); dropDuplicatesWithinWatermark still
      // evicts per-key state once the watermark passes it
      .dropDuplicatesWithinWatermark(Seq("_fp"))

  // ---- custom sessionization state machine ----

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(start: Long, lastSeen: Long, nEvents: Long)

  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Per-user session boundaries via `mapGroupsWithState` — the custom
    * state-machine escape hatch (SURVEY §7: `KeyValueGroupedDataset`
    * stateful ops) for semantics windowed aggregation can't express.
    * A session closes after `gapMs` of inactivity (processing-time
    * timeout); state per user is O(1). */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](timeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionOut(userId, new Timestamp(s.start), new Timestamp(s.lastSeen), s.nEvents)
          } else {
            val times = batch.map(_.ts.getTime).toSeq
            val prev = state.getOption
            val merged = prev match {
              case Some(s) => SessionState(
                s.start.min(times.min), s.lastSeen.max(times.max), s.nEvents + times.size)
              case None => SessionState(times.min, times.max, times.size.toLong)
            }
            state.update(merged)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(gapMs)
            SessionOut(userId, new Timestamp(merged.start), new Timestamp(merged.lastSeen), merged.nEvents)
          }
      }
  }

  /** Native event-time sessionization via Spark's `session_window` —
    * the declarative alternative to the [[sessionize]] state machine:
    * works identically over batch and streaming input (with a
    * watermark), merges events closer than `gap`, and lets Catalyst own
    * the session-merge state. One shuffle on the grouping key.
    * Returns (user_id, session_start, session_end, n_events). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), gap).as("_w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("_w.start").as("session_start"),
        col("_w.end").as("session_end"),
        col("n_events"))

  /** Batch-mode sessionization with the same gap semantics (event-time
    * gaps via window lag) — used to cross-check the streaming state
    * machine and as the backfill path. */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    // integer-millisecond gap arithmetic: exact, engine-portable (a
    // double epoch would flip floor() at ns boundaries)
    events
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .withColumn("_newSession",
        when(col("_prev").isNull ||
          unix_millis(col("ts")) - unix_millis(col("_prev")) > gapMs, 1)
          .otherwise(0))
      .withColumn("_sid", sum("_newSession").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "_sid")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("_sid")
  }

  /** Write a streaming result to parquet with checkpointing. */
  def toParquet(df: DataFrame, path: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .start(path)

  /** Continuous ingest into a LOCAL MergeTree part tree — ClickHouse's
    * Kafka/streaming-table story re-expressed as Structured Streaming:
    * every micro-batch appends as new parts (CH's part-per-INSERT
    * write model, executor-parallel since r11), so the accreting tree
    * is readable through the ATTACH data path THROUGHOUT ingest, the
    * incremental projection MATERIALIZE merges exactly the new parts,
    * and a periodic `OPTIMIZE TABLE … FINAL` compacts the accretion —
    * the same operational loop a CH table fed by its Kafka engine
    * lives. The first micro-batch creates the tree.
    *
    * Delivery is AT-LEAST-ONCE across crash/restart: a batch whose
    * append completed but whose checkpoint commit didn't can replay —
    * the contract CH's own Kafka engine ships; dedup downstream by key
    * (exact dedup / FINAL) when it matters. `availableNow = true`
    * drains the current source and terminates — the batch-backfill
    * trigger. */
  def toMergeTree(
      df: DataFrame,
      dir: String,
      orderBy: Seq[String],
      checkpoint: String,
      availableNow: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // after the first batch established the tree, its own column
        // list is authoritative — without it a later batch with (say)
        // an observed NULL would derive a DIFFERENT CH type than the
        // tree's and silently drift the per-part schemas. Only the
        // validated no-tree-yet refusal falls back to derivation; a
        // REAL read error must fail the batch so the checkpoint
        // retries it, not silently re-derive (review finding)
        val ddl =
          try Some(graft.sources.mergetree.MergeTree.ddlOf(dir)).filter(_.nonEmpty)
          catch { case _: IllegalArgumentException => None }
        // the stream must BE the tree, column for column — a stream
        // pointed at a different-shaped tree would append mixed-schema
        // parts (the same guard the INSERT INTO front door applies)
        ddl.foreach { d =>
          val declared = graft.types.ChSchemaParser.columnPairs(d).map(_._1)
          require(batch.columns.toSeq == declared,
            s"streaming INSERT into '$dir': the stream's columns " +
              s"(${batch.columns.mkString(", ")}) do not match the " +
              s"tree's (${declared.mkString(", ")})")
        }
        graft.sources.mergetree.MergeTreeCtas.appendPart(
          batch.sparkSession, batch.toDF(), dir, orderBy,
          declaredDdl = ddl, op = "streaming INSERT",
          partitionBy = graft.core.Catalog.partitionByForEndpoint(dir))
        ()
      }
    (if (availableNow)
      w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else w).start()
  }
}
