package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventStreamsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("text-pipeline quality filter + mixture run unchanged on a stream (scan-stage ops are stream-safe)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val docs = Seq(
      (0L, "en", "a solid document with enough words to pass the quality gate and then some more padding words here"),
      (1L, "en", "x"), // fails min-words
      (2L, "de", "ein weiteres dokument mit genug worten um die qualitaet zu bestehen und noch etwas mehr text dazu"))
    mem.addData(docs: _*)
    val streamed = mem.toDF().toDF("doc_id", "lang", "text")
    // the SAME operators, no streaming-specific variants: gopherFilter
    // and mixture are scan-stage expressions, legal on unbounded plans
    val piped = graft.operators.Sampling.mixture(
      graft.operators.TextAnalysis.gopherFilter(streamed, "text").filter($"keep"),
      "lang", "text", Map("en" -> 1.0, "de" -> 1.0))
    val q = piped.select("doc_id").writeStream
      .format("memory").queryName("stream_quality").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("stream_quality").as[Long].collect().toSet
      // batch twin over the identical rows
      val batch = graft.operators.Sampling.mixture(
        graft.operators.TextAnalysis.gopherFilter(
          docs.toDF("doc_id", "lang", "text"), "text").filter($"keep"),
        "lang", "text", Map("en" -> 1.0, "de" -> 1.0))
        .select("doc_id").as[Long].collect().toSet
      assert(got == batch)
      assert(!got.contains(1L)) // the quality gate dropped the junk doc
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks to impressions within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[EventStreams.Event]
    val clicks = MemoryStream[EventStreams.Event]
    imps.addData(
      EventStreams.Event(0, ts(0), 1, "imp", 0),
      EventStreams.Event(1, ts(0), 2, "imp", 0))
    clicks.addData(
      EventStreams.Event(10, ts(5), 1, "click", 0),   // within 15m of imp 0
      EventStreams.Event(11, ts(60), 1, "click", 0),  // too late for imp 0
      EventStreams.Event(12, ts(3), 3, "click", 0))   // no matching user
    val q = EventStreams.intervalJoinStream(imps.toDF(), clicks.toDF(),
        within = "15 minutes")
      .select("user_id", "l_id", "r_id")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ij").as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 0L, 10L)))
      // the batch twin over identical frames agrees (same expressions)
      val batch = EventStreams.intervalJoinStream(
        Seq(EventStreams.Event(0, ts(0), 1, "imp", 0),
          EventStreams.Event(1, ts(0), 2, "imp", 0)).toDF(),
        Seq(EventStreams.Event(10, ts(5), 1, "click", 0),
          EventStreams.Event(11, ts(60), 1, "click", 0),
          EventStreams.Event(12, ts(3), 3, "click", 0)).toDF(),
        within = "15 minutes")
        .select("user_id", "l_id", "r_id").as[(Long, Long, Long)].collect().toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("windowed counts over a MemoryStream match the batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val events = Seq(
      EventStreams.Event(0, ts(5), 1, "click", 1.0),
      EventStreams.Event(1, ts(20), 1, "click", 2.0),
      EventStreams.Event(2, ts(70), 2, "view", 3.0),
      EventStreams.Event(3, ts(80), 1, "click", 4.0))
    mem.addData(events: _*)

    val q = EventStreams.windowedCounts(mem.toDF(), "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // hour 0: 2 clicks (100+200 cents); hour 1: 1 click (400), 1 view (300)
      assert(got.length == 3)
      assert(got(0)._2 == "click" && got(0)._3 == 2L && got(0)._4 == 300L)
      assert(got(1)._2 == "click" && got(1)._3 == 1L && got(1)._4 == 400L)
      assert(got(2)._2 == "view" && got(2)._3 == 1L && got(2)._4 == 300L)
      // batch semantics agree: same expression path over a static frame
      val batch = EventStreams.windowedCounts(events.toDF(), "1 hour")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(batch.toSeq == got.toSeq)
    } finally q.stop()
  }

  test("streaming sessionization emits per-user state updates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    mem.addData(
      EventStreams.Event(0, ts(0), 1, "click", 1.0),
      EventStreams.Event(1, ts(10), 1, "click", 1.0),
      EventStreams.Event(2, ts(5), 2, "view", 1.0))
    // NoTimeout keeps the test deterministic: a single batch, no
    // wall-clock-driven timer triggers
    val q = EventStreams.sessionize(mem.toDS(), gapMs = 60000,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions").orderBy("user_id").collect()
      assert(got.length == 2)
      val u1 = got(0)
      assert(u1.getAs[Long]("user_id") == 1L)
      assert(u1.getAs[Long]("n_events") == 2L)
      assert(u1.getAs[Timestamp]("session_start") == ts(0))
      assert(u1.getAs[Timestamp]("session_end") == ts(10))
    } finally q.stop()
  }

  test("streaming dedup drops in-horizon duplicates exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    mem.addData(
      EventStreams.Event(1, ts(0), 1, "click", 1.0),
      EventStreams.Event(1, ts(0), 1, "click", 1.0), // exact duplicate
      EventStreams.Event(2, ts(1), 1, "click", 1.0))
    val q = EventStreams.dedupStream(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a duplicate arriving in a LATER batch is also dropped
      mem.addData(EventStreams.Event(2, ts(1), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
    } finally q.stop()
  }

  test("streaming near-dup dedup drops same-fingerprint docs across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, ts: Timestamp, text: String)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val txt = "the quick brown fox jumps over the lazy dog again and again"
    mem.addData((1L, ts(0), txt), (2L, ts(1), txt)) // near-dup at a later ts
    val q = EventStreams.nearDupDedupStream(
        mem.toDF().toDF("doc_id", "ts", "text"), "text")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData((3L, ts(2), txt)) // later batch, same fingerprint
      mem.addData((4L, ts(3), "completely different payload about spark plans"))
      q.processAllAvailable()
      val kept = spark.table("neardup_stream").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept.contains(4L), "distinct doc must survive")
      assert((kept - 4L).size == 1, s"only one of the near-dups may survive, kept: $kept")
    } finally q.stop()
  }

  test("session_window sessionization works over a stream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    mem.addData((1L, ts(0)), (1L, ts(10)), (1L, ts(100)), (2L, ts(5)))
    val q = EventStreams.sessionWindows(
        mem.toDF().toDF("user_id", "ts").withWatermark("ts", "0 seconds"),
        "30 minutes")
      .writeStream.format("memory").queryName("swin")
      .outputMode("append").start()
    try {
      // advance the watermark far past all sessions so they emit
      mem.addData((9L, ts(10000)))
      q.processAllAvailable()
      val got = spark.table("swin")
        .select("user_id", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // user 1: one session of 2 (0,10 min) + one of 1 (100); user 2: one of 1
      assert(got.contains((1L, 2L)) && got.contains((1L, 1L)) && got.contains((2L, 1L)))
    } finally q.stop()
  }

  test("batch sessionization splits on the inactivity gap") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(0)), (1L, ts(10)), // session A
      (1L, ts(100)), (1L, ts(105)), // session B (90-min gap)
      (2L, ts(50))).toDF("user_id", "ts")
    val out = EventStreams.sessionizeBatch(df, gapMs = 30 * 60 * 1000L)
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(1).getAs[Long]("n_events") == 2L)
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("streaming ingest into a MergeTree tree: part per batch, readable mid-stream, OPTIMIZE compacts") {
    import spark.implicits._
    import graft.sources.mergetree.MergeTree
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val base = java.nio.file.Files.createTempDirectory("graft_stream_mt").toString
    val tree = s"$base/tree"
    val q = EventStreams.toMergeTree(
      mem.toDF().toDF("k", "v"), tree, Seq("k"), s"$base/ckpt")
    var ddl = ""
    try {
      mem.addData((2L, 2.0), (1L, 1.0))
      q.processAllAvailable()
      ddl = MergeTree.ddlOf(tree)
      assert(MergeTree.partsInfo(tree).size == 1)
      // the tree is readable THROUGH the ATTACH data path mid-stream
      assert(MergeTree.read(spark, tree, ddl, Seq("k")).count() == 2)
      mem.addData((3L, 3.0))
      q.processAllAvailable()
      assert(MergeTree.partsInfo(tree).size == 2, "each micro-batch appends parts")
      assert(MergeTree.read(spark, tree, ddl, Seq("k"))
        .agg(org.apache.spark.sql.functions.sum("k")).collect().head.getLong(0) == 6L)
    } finally q.stop()
    // the CH operational loop: OPTIMIZE FINAL compacts the accretion
    MergeTree.read(spark, tree, ddl, Seq("k")).createOrReplaceTempView("stream_mt")
    graft.dialect.ChSql.sql(spark, "OPTIMIZE TABLE stream_mt FINAL").collect()
    assert(MergeTree.partsInfo(tree).size == 1)
    assert(MergeTree.read(spark, tree, ddl, Seq("k")).count() == 3)
  }

  test("file-arrival streaming reads the events shape from a directory") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(100).write.mode("overwrite").parquet(tmp)
    val stream = EventStreams.fromParquetDir(spark, tmp, s"$tmp")
    assert(stream.isStreaming)
    val q = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("file_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_stream").count() > 0)
    } finally q.stop()
  }
}
