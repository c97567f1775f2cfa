package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{SessionEvent, SessionSummary}

/** Structured-Streaming semantics: sessionization state machine +
  * batch equivalence of the windowed agg. */
class StreamingSpec extends SparkTestBase {

  // base well above epoch 0: rows at ts <= the initial watermark (0)
  // are dropped as late, so epoch-0 events never reach the operator
  private val base = 1700000000000L
  private def ts(minute: Int) = new java.sql.Timestamp(base + minute * 60L * 1000L)

  test("sessionizeStream emits rolled-over sessions and flushes idle ones via timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = EventStreams.sessionizeStream(input.toDS(), gapMinutes = 30)
    val query = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("append").start()
    try {
      // user 1: two events 10min apart (one session), then a 40-min gap
      // event -> rollover emits the first session
      input.addData(
        SessionEvent(1L, ts(0), 1L, "view", 1.0),
        SessionEvent(2L, ts(10), 1L, "click", 2.0))
      query.processAllAvailable()
      input.addData(SessionEvent(3L, ts(50), 1L, "view", 5.0))
      query.processAllAvailable()
      val afterRollover = s.table("sessions_out").as[SessionSummary].collect()
      assert(afterRollover.length == 1)
      assert(afterRollover(0).n_events == 2L && afterRollover(0).total_value == 3.0)
      // advance the watermark far past the open session's timeout: the
      // idle session (event 3) must flush WITHOUT another event for user 1
      input.addData(SessionEvent(99L, ts(1000), 2L, "view", 0.0))
      query.processAllAvailable()
      input.addData(SessionEvent(100L, ts(1001), 2L, "view", 0.0))
      query.processAllAvailable()
      val flushed = s.table("sessions_out").as[SessionSummary].collect()
        .filter(r => r.user_id == 1L)
      assert(flushed.length == 2, s"idle session not flushed: ${flushed.toSeq}")
    } finally query.stop()
  }

  test("sessionizeWindowed (native session_window) streams append-mode sessions " +
      "that match its batch run") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = Seq(
      SessionEvent(1L, ts(0), 1L, "view", 1.0),
      SessionEvent(2L, ts(10), 1L, "click", 2.0),   // same session (gap 10 < 30)
      SessionEvent(3L, ts(50), 1L, "view", 5.0),    // gap 40 -> new session
      SessionEvent(4L, ts(5), 2L, "view", 3.0))
    val input = MemoryStream[SessionEvent]
    val out = EventStreams.sessionizeWindowed(input.toDF(), gapMinutes = 30,
      watermark = Some("10 minutes"))
    val query = out.writeStream.format("memory")
      .queryName("swin_out").outputMode("append").start()
    try {
      input.addData(evs: _*)
      query.processAllAvailable()
      // advance the watermark far past every session's end to flush all
      input.addData(SessionEvent(99L, ts(1000), 9L, "view", 0.0))
      query.processAllAvailable()
      input.addData(SessionEvent(100L, ts(1001), 9L, "view", 0.0))
      query.processAllAvailable()
      val streamed = s.table("swin_out")
        .select("user_id", "session_start", "n_events", "total_value")
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.sessionizeWindowed(evs.toDF(), gapMinutes = 30)
        .select("user_id", "session_start", "n_events", "total_value")
        .collect().map(_.toSeq).toSet
      assert(batch.subsetOf(streamed),
        s"streamed sessions must cover the batch run:\nbatch=$batch\nstream=$streamed")
      assert(streamed.exists(r => r.head == 1L && r(2) == 2L && r(3) == 3.0),
        s"user 1's first session (2 events, 3.0) missing: $streamed")
    } finally query.stop()
  }

  test("session_window boundary: an event exactly gap minutes later still MERGES") {
    val s = spark
    import s.implicits._
    // Spark merges sessions whose windows touch (closed boundary): an
    // event at last_ts + gap joins the session; one micro-second past
    // it opens a new one. The s_session_window oracle replays this
    // with its strict `> gap` new-session test.
    val evs = Seq(
      SessionEvent(1L, ts(0), 1L, "view", 1.0),
      SessionEvent(2L, ts(30), 1L, "view", 1.0)) // exactly the 30-min gap
    val n = EventStreams.sessionizeWindowed(evs.toDF(), gapMinutes = 30).count()
    assert(n == 1L, s"touching session windows merge: expected 1 session, got $n")
    val past = Seq(
      SessionEvent(1L, ts(0), 1L, "view", 1.0),
      SessionEvent(2L, new java.sql.Timestamp(base + 30L * 60L * 1000L + 1L),
        1L, "view", 1.0)) // 1 ms past the gap
    val n2 = EventStreams.sessionizeWindowed(past.toDF(), gapMinutes = 30).count()
    assert(n2 == 2L, s"past-gap event must open a new session: got $n2")
  }

  test("rateLimitStream admits first-n per (user, window) and matches the batch twin") {
    import graft.streaming.EventStreams.{RLEvent, RLVerdict}
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[RLEvent]
    val verdicts = EventStreams.rateLimitStream(input.toDS(), n = 2,
      windowMinutes = 60)
    val query = verdicts.writeStream.format("memory")
      .queryName("rl_out").outputMode("append").start()
    try {
      // user 1: three events in one hour window across TWO microbatches
      // (cumulative count must carry); user 2 independent
      input.addData(RLEvent(1L, ts(1), 1L), RLEvent(2L, ts(2), 1L),
        RLEvent(10L, ts(3), 2L))
      query.processAllAvailable()
      input.addData(RLEvent(3L, ts(4), 1L), // over quota
        RLEvent(4L, ts(65), 1L))            // next window: quota resets
      query.processAllAvailable()
      val out = s.table("rl_out").as[RLVerdict].collect()
        .map(v => v.event_id -> v.admitted).toMap
      assert(out == Map(1L -> true, 2L -> true, 10L -> true,
        3L -> false, 4L -> true))
      // batch twin adjudicates identically on the replayed feed
      val batch = EventStreams.rateLimitBatch(
        Seq((1L, ts(1), 1L), (2L, ts(2), 1L), (10L, ts(3), 2L),
          (3L, ts(4), 1L), (4L, ts(65), 1L))
          .toDF("event_id", "ts", "user_id"), n = 2, windowMinutes = 60)
        .collect().map(r =>
          r.getAs[Long]("event_id") -> r.getAs[Boolean]("admitted")).toMap
      assert(batch == out)
    } finally query.stop()
  }

  test("windowedAgg batch matches a hand-computed hourly rollup") {
    val events = sqlDf(
      "event_type" -> Seq("a", "a", "b"),
      "value" -> Seq(1.0, 2.0, 5.0))
      .withColumn("ts",
        when(col("value") === 5.0, lit("2024-01-01 01:30:00")).otherwise(lit("2024-01-01 00:10:00"))
          .cast("timestamp"))
    val out = EventStreams.windowedAgg(events, "1 hour").orderBy("wstart", "event_type")
    val got = out.collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("total")))
    assert(got.toSeq == Seq(("a", 2L, 3.0), ("b", 1L, 5.0)))
  }

  test("windowedAgg over a STREAM emits finalized windows after the watermark passes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[SessionEvent]
    val agg = EventStreams.windowedAgg(input.toDF(), "1 hour", watermark = Some("10 minutes"))
    val query = agg.writeStream.format("memory")
      .queryName("winagg_out").outputMode("append").start()
    try {
      input.addData(
        SessionEvent(1L, ts(5), 1L, "view", 1.0),
        SessionEvent(2L, ts(20), 1L, "view", 2.0))
      query.processAllAvailable()
      // advance event time far past hour 0 + watermark: hour-0 window finalizes
      input.addData(SessionEvent(3L, ts(200), 1L, "view", 5.0))
      query.processAllAvailable()
      input.addData(SessionEvent(4L, ts(210), 1L, "view", 0.5))
      query.processAllAvailable()
      val rows = s.table("winagg_out").collect()
      assert(rows.length == 1, s"expected exactly the finalized hour-0 window: ${rows.toSeq}")
      assert(rows(0).getAs[Long]("n") == 2L && rows(0).getAs[Double]("total") == 3.0)
    } finally query.stop()
  }

  test("intervalJoin joins two STREAMS within the time window only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val clicks = MemoryStream[SessionEvent]
    val purchases = MemoryStream[SessionEvent]
    val joined = EventStreams.intervalJoin(clicks.toDF(), purchases.toDF(),
      windowMinutes = 60)
    val query = joined.writeStream.format("memory")
      .queryName("ij_out").outputMode("append").start()
    try {
      // purchase 30min before click (in window), one 2h before (outside),
      // one AFTER the click (outside: join looks backward only)
      purchases.addData(
        SessionEvent(10L, ts(0), 1L, "purchase", 5.0),    // click-30m: in
        SessionEvent(11L, ts(-90), 1L, "purchase", 7.0),  // click-2h: out
        SessionEvent(12L, ts(60), 1L, "purchase", 9.0))   // click+30m: out
      clicks.addData(SessionEvent(1L, ts(30), 1L, "click", 0.0))
      query.processAllAvailable()
      val rows = s.table("ij_out").collect()
      assert(rows.length == 1, s"expected one in-window pair: ${rows.toSeq}")
      assert(rows(0).getAs[Long]("r_event_id") == 10L)
      assert(rows(0).getAs[Double]("r_value") == 5.0)
    } finally query.stop()
  }

  test("enrichStatic joins a STREAM against a broadcast dim without state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = sqlDf("key" -> Seq(0L, 1L), "tier" -> Seq("bronze", "gold"))
    val input = MemoryStream[SessionEvent]
    val enriched = EventStreams.enrichStatic(input.toDF(), dim,
      pmod(col("user_id"), lit(2)), col("key"))
    val query = enriched.writeStream.format("memory")
      .queryName("enrich_out").outputMode("append").start()
    try {
      input.addData(
        SessionEvent(1L, ts(0), 1L, "view", 1.0),   // user 1 → gold
        SessionEvent(2L, ts(1), 2L, "view", 2.0),   // user 2 → bronze
        SessionEvent(3L, ts(2), 5L, "view", 3.0))   // user 5 → gold
      query.processAllAvailable()
      val got = s.table("enrich_out").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("tier"))).toSet
      assert(got == Set((1L, "gold"), (2L, "bronze"), (3L, "gold")), got.toString)
    } finally query.stop()
  }

  test("intervalJoin batch form matches a hand-computed rollup") {
    val ev = sqlDf(
      "event_id" -> Seq(1L, 10L, 11L, 12L),
      "user_id" -> Seq(1L, 1L, 1L, 2L),
      "event_type" -> Seq("click", "purchase", "purchase", "purchase"),
      "value" -> Seq(0.0, 5.0, 7.0, 9.0),
      "m" -> Seq(30, 0, -90, 10)) // minutes relative to base
      .withColumn("ts", timestamp_millis(lit(base) + col("m") * 60000L))
    val out = EventStreams.intervalJoin(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"), 60).collect()
    // only purchase 10 is in user 1's trailing hour (11 too old, 12 is user 2)
    assert(out.length == 1 && out(0).getAs[Long]("r_event_id") == 10L)
  }

  test("dedupStream drops duplicate event_ids within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[SessionEvent]
    val deduped = EventStreams.dedupStream(input.toDF())
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(
        SessionEvent(1L, ts(0), 1L, "view", 1.0),
        SessionEvent(1L, ts(0), 1L, "view", 1.0),
        SessionEvent(2L, ts(1), 1L, "view", 1.0))
      query.processAllAvailable()
      assert(s.table("dedup_out").count() == 2)
    } finally query.stop()
  }

  test("nearDupStream verdicts across microbatches match the batch twin") {
    import graft.streaming.NearDupStream
    import graft.streaming.NearDupStream.NDDoc
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val batch1 = Seq(
      NDDoc(1L, ts(0), "the quick brown fox jumps over the lazy dog"),
      NDDoc(2L, ts(1), "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      NDDoc(3L, ts(2), "completely different content about spark engines"))
    val batch2 = Seq(
      NDDoc(4L, ts(3), "the quick brown fox jumped over the lazy dog"), // near dup of 1
      NDDoc(5L, ts(4), "the quick brown fox jumps over the lazy dog"), // dup ACROSS batches
      NDDoc(6L, ts(5), "yet another unrelated document entirely here"))
    val sentinel1 = NDDoc(98L, ts(600), "sentinel one advancing the watermark")
    val sentinel2 = NDDoc(99L, ts(610), "sentinel two advancing the watermark")
    val input = MemoryStream[NDDoc]
    val out = NearDupStream.nearDupStream(input.toDS(),
      watermark = "10 minutes", windowLen = "1 hour")
    val query = out.writeStream.format("memory")
      .queryName("neardup_out").outputMode("append").start()
    try {
      input.addData(batch1: _*); query.processAllAvailable()
      input.addData(batch2: _*); query.processAllAvailable()
      // two watermark-advancing batches flush the hour-0 window
      input.addData(sentinel1); query.processAllAvailable()
      input.addData(sentinel2); query.processAllAvailable()
      val streamed = s.table("neardup_out")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
      val all = batch1 ++ batch2 ++ Seq(sentinel1, sentinel2)
      val batch = NearDupStream.nearDupBatch(all.toDF())
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
      // the flushed docs (1-6) must carry identical verdicts
      (1L to 6L).foreach { d =>
        assert(streamed.contains(d), s"doc $d not flushed: $streamed")
        assert(streamed(d) == batch(d),
          s"doc $d: stream ${streamed(d)} != batch ${batch(d)}")
      }
      // semantic anchors: 2 and 5 are full-band dups of 1; 3 and 6 unique
      assert(streamed(2L)._2 && streamed(5L)._2)
      assert(!streamed(3L)._2 && !streamed(6L)._2)
    } finally query.stop()
  }

  test("nearDupStream horizon evicts bucket state and re-admits old dups") {
    import graft.streaming.NearDupStream
    import graft.streaming.NearDupStream.NDDoc
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[NDDoc]
    val out = NearDupStream.nearDupStream(input.toDS(),
      watermark = "10 minutes", windowLen = "1 hour", horizonMinutes = 30)
    val query = out.writeStream.format("memory")
      .queryName("neardup_hz_out").outputMode("append").start()
    try {
      input.addData(NDDoc(1L, ts(0), "the quick brown fox jumps over the lazy dog"))
      query.processAllAvailable()
      // far past the 30-min horizon: bucket state for doc 1 is evicted,
      // so the SAME text re-admits as non-dup (bounded-state trade)
      input.addData(NDDoc(2L, ts(300), "the quick brown fox jumps over the lazy dog"))
      query.processAllAvailable()
      input.addData(NDDoc(98L, ts(900), "sentinel one advancing the watermark"))
      query.processAllAvailable()
      input.addData(NDDoc(99L, ts(910), "sentinel two advancing the watermark"))
      query.processAllAvailable()
      val got = s.table("neardup_hz_out")
        .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
      assert(got.get(1L) == Some(false), s"first copy must be kept: $got")
      assert(got.get(2L) == Some(false),
        s"dup past the horizon must be re-admitted (state evicted): $got")
    } finally query.stop()
  }

  test("dedupStreamWithinWatermark drops dups and bounds state by the horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[SessionEvent]
    val deduped = EventStreams.dedupStreamWithinWatermark(input.toDF(), "30 minutes")
    val query = deduped.writeStream.format("memory")
      .queryName("dedup_wm_out").outputMode("append").start()
    try {
      input.addData(
        SessionEvent(1L, ts(0), 1L, "view", 1.0),
        SessionEvent(1L, ts(1), 1L, "view", 1.0))
      query.processAllAvailable()
      assert(s.table("dedup_wm_out").count() == 1)
    } finally query.stop()
  }

  test("corpus-admission stream admits only new content and replays idempotently") {
    import graft.streaming.CorpusDedupStream
    import graft.streaming.NearDupStream.NDDoc
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val corpus = Seq((1L, "alpha content"), (2L, "beta content"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_admit").toFile
    val accept = new java.io.File(dir, "accept").getPath
    val ck = new java.io.File(dir, "ck").getPath
    val input = MemoryStream[NDDoc]
    val writer = CorpusDedupStream.admitNew(
      input.toDF().select(col("doc_id"), col("text")), corpus,
      md5(col("text")), md5(col("text")), expectedItems = 100L, accept)
    val query = writer.option("checkpointLocation", ck).start()
    try {
      input.addData(NDDoc(10L, ts(0), "alpha content"),   // dup of corpus 1
        NDDoc(11L, ts(1), "gamma content"))               // new
      query.processAllAvailable()
      input.addData(NDDoc(12L, ts(2), "beta content"),    // dup of corpus 2
        NDDoc(13L, ts(3), "delta content"))               // new
      query.processAllAvailable()
      val admitted = s.read.parquet(accept)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(admitted == Set(11L, 13L),
        s"only genuinely-new content admits: $admitted")
      // batch twin agrees
      val twin = CorpusDedupStream.admitNewBatch(
        Seq((10L, "alpha content"), (11L, "gamma content"),
          (12L, "beta content"), (13L, "delta content")).toDF("doc_id", "text"),
        corpus, md5(col("text")), md5(col("text")), 100L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(twin == admitted, s"stream and batch twin must agree: $twin")
    } finally query.stop()
  }

  test("quality router fans one stream into accept/reject sinks, replays idempotently") {
    import graft.streaming.NearDupStream.NDDoc
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_route").toFile
    val accept = new java.io.File(dir, "accept").getPath
    val reject = new java.io.File(dir, "reject").getPath
    val ck = new java.io.File(dir, "ck").getPath
    val score = length(col("text")).cast("double")
    val input = MemoryStream[NDDoc]
    val query = EventStreams.routeByQuality(input.toDF(), score,
        threshold = 20.0, accept, reject)
      .option("checkpointLocation", ck).start()
    try {
      input.addData(
        NDDoc(1L, ts(0), "long enough to pass the quality bar"),
        NDDoc(2L, ts(1), "too short"))
      query.processAllAvailable()
      input.addData(NDDoc(3L, ts(2), "another sufficiently long document body"))
      query.processAllAvailable()
      val acc = s.read.parquet(accept)
      val rej = s.read.parquet(reject)
      assert(acc.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
      assert(rej.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
      // batch_id rides as a partition column for downstream readers
      assert(acc.columns.contains("batch_id"))
      // replaying a delivered batch (post-failure re-delivery) rewrites
      // its directory instead of duplicating rows
      EventStreams.routeBatch(
        Seq(NDDoc(1L, ts(0), "long enough to pass the quality bar"),
          NDDoc(2L, ts(1), "too short")).toDF(),
        batchId = 0L, score, 20.0, accept, reject)
      assert(s.read.parquet(accept).count() == 2)
      assert(s.read.parquet(reject).count() == 1)
    } finally query.stop()
  }

  test("kmv sink: standing overlap equals the two-scan batch math; replay and order are free") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col => c}
    val dir = java.nio.file.Files.createTempDirectory("graft_kmvsink").toFile
    val d1 = new java.io.File(dir, "a").getPath
    val d2 = new java.io.File(dir, "b").getPath
    val corpus = (1 to 400).map(i => s"doc$i").toDF("t")
    // stream shares 200 docs with the corpus, brings 200 new ones
    val b0 = (1 to 200).map(i => s"doc$i").toDF("t")
    val b1 = (1 to 200).map(i => s"new$i").toDF("t")
    graft.streaming.KmvStream.foldBatch(b0, c("t"), 64, d1)
    graft.streaming.KmvStream.foldBatch(b1, c("t"), 64, d1)
    // reverse order + replay into d2
    graft.streaming.KmvStream.foldBatch(b1, c("t"), 64, d2)
    graft.streaming.KmvStream.foldBatch(b0, c("t"), 64, d2)
    graft.streaming.KmvStream.foldBatch(b1, c("t"), 64, d2)
    def read(p: String) = graft.streaming.KmvStream
      .overlapWithCorpus(s, p, corpus, c("t"), 64).collect().head
    assert(read(d1).toSeq == read(d2).toSeq,
      "order + replay must not change the sketch")
    // identical to the two-scan batch form over the stream union
    val batch = graft.ops.Profiling.kmvOverlap(
      corpus, c("t"), b0.unionByName(b1), c("t"), 64).collect().head
    assert(read(d1).toSeq == batch.toSeq)
    // ~50% true jaccard (200 shared / 600 union) within sketch noise
    val jac = batch.getAs[Double]("jaccard_est")
    assert(jac > 0.15 && jac < 0.55, s"jaccard estimate off: $jac")
  }

  test("hll sink: standing estimate equals the batch sketch; replay and order are free") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col => c}
    val dir = java.nio.file.Files.createTempDirectory("graft_hllsink").toFile
    val d1 = new java.io.File(dir, "a").getPath
    val d2 = new java.io.File(dir, "b").getPath
    val b0 = (1 to 300).map(i => ("en", s"w${i % 120}")).toDF("lang", "term")
    val b1 = (1 to 300).map(i => ("en", s"w${i % 200}"))
      .++(Seq(("de", "zehn"), ("de", "elf"))).toDF("lang", "term")
    // fold in one order into d1, the REVERSE order plus a replay into d2
    graft.streaming.HllStream.foldBatch(b0, c("lang"), c("term"), 8, d1)
    graft.streaming.HllStream.foldBatch(b1, c("lang"), c("term"), 8, d1)
    graft.streaming.HllStream.foldBatch(b1, c("lang"), c("term"), 8, d2)
    graft.streaming.HllStream.foldBatch(b0, c("lang"), c("term"), 8, d2)
    graft.streaming.HllStream.foldBatch(b0, c("lang"), c("term"), 8, d2) // replay
    def read(p: String) = graft.streaming.HllStream
      .standingEstimate(s, p, "lang").orderBy("lang")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(read(d1) == read(d2), "order + replay must not change the sketch")
    // bit-identical to the one-shot batch sketch over the union
    val batch = graft.ops.Profiling.hllDistinct(
        b0.unionByName(b1), Seq("lang"), c("term"), p = 8)
      .orderBy("lang")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(read(d1) == batch, s"standing != batch: ${read(d1)} vs $batch")
    // sanity: ~200 distinct en terms, generous band (no small-range
    // linear-counting correction in this estimator — raw HLL runs
    // high below ~2.5m)
    val en = batch.find(_._1 == "en").get
    assert(en._2 > 120 && en._2 < 400, s"estimate off: $en")
  }

  test("cusum sink emits the batch operator's exact trace across micro-batches") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cusink").toFile
    val state = new java.io.File(dir, "state").getPath
    val h0 = 1700000000000L // hour-aligned epoch? floor to be safe
    val base = (h0 / 3600000L) * 3600000L
    def ev(hour: Int, n: Int, tpe: String = "e") =
      (1 to n).map(i => ((hour * 1000 + i).toLong,
        new java.sql.Timestamp(base + hour * 3600000L + i * 1000L), 1L, tpe, 1.0))
    // batch 0: hours 0-2 at 6/h; batch 1: SILENT hours 3-4, then
    // hours 5-6 at 7/h plus a NEW type appearing at hour 6
    val b0 = (ev(0, 6) ++ ev(1, 6) ++ ev(2, 6))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val b1 = (ev(5, 7) ++ ev(6, 7) ++ ev(6, 5, "late_type"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val t0 = graft.streaming.CusumStream.foldBatch(b0, state, 0L, "1 hour",
      k = 4L, h = 8L)
    val t1 = graft.streaming.CusumStream.foldBatch(b1, state, 1L, "1 hour",
      k = 4L, h = 8L)
    val trace = t0.unionByName(t1)
      .orderBy("event_type", "wstart").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // batch operator over the union is the ground truth
    val expect = graft.ops.EventAnalytics
      .cusumChangePoints(b0.unionByName(b1), "1 hour", k = 4L, h = 8L)
      .orderBy("event_type", "wstart").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(trace.toSeq == expect.toSeq,
      s"stream trace must equal the batch operator:\n${trace.toSeq}\nvs\n${expect.toSeq}")
    // the new type back-filled zero windows from the spine start
    assert(trace.count(_._1 == "late_type") == 7)
    // replaying a folded batch id emits nothing (idempotence)
    val replay = graft.streaming.CusumStream.foldBatch(b1, state, 1L, "1 hour",
      k = 4L, h = 8L)
    assert(replay.count() == 0)
    // a window behind the cursor fails loudly instead of corrupting S
    val late = ev(1, 3).toDF("event_id", "ts", "user_id", "event_type", "value")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.CusumStream.foldBatch(late, state, 2L, "1 hour", 4L, 8L)
    }
    assert(e.getMessage.contains("behind the cursor"))
  }

  test("ewma sink emits the batch operator's exact trace; knobs are pinned") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ewsink").toFile
    val state = new java.io.File(dir, "state").getPath
    val base = (1700000000000L / 3600000L) * 3600000L
    def ev(hour: Int, n: Int, tpe: String = "e") =
      (1 to n).map(i => ((hour * 1000 + i).toLong,
        new java.sql.Timestamp(base + hour * 3600000L + i * 1000L), 1L, tpe, 1.0))
    // batch 0: hours 0-2; batch 1: SILENT hours 3-4, a surge at hour
    // 5, and a NEW type appearing at hour 6 (spine back-fill)
    val b0 = (ev(0, 4) ++ ev(1, 8) ++ ev(2, 6))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val b1 = (ev(5, 40) ++ ev(6, 7) ++ ev(6, 5, "late_type"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val t0 = graft.streaming.EwmaStream.foldBatch(b0, state, 0L, "1 hour",
      horizon = 16, mult = 4L, guard = 4L)
    val t1 = graft.streaming.EwmaStream.foldBatch(b1, state, 1L, "1 hour",
      horizon = 16, mult = 4L, guard = 4L)
    val trace = t0.unionByName(t1)
      .orderBy("event_type", "wstart").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    // BIT-identical to the batch operator over everything seen so far
    // — dyadic arithmetic makes the doubles comparable with ==
    val expect = graft.ops.EventAnalytics
      .ewmaChart(b0.unionByName(b1), "1 hour", horizon = 16,
        mult = 4L, guard = 4L)
      .orderBy("event_type", "wstart").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(trace.toSeq == expect.toSeq,
      s"stream trace must equal the batch operator:\n${trace.toSeq}\nvs\n${expect.toSeq}")
    // the surge actually alarmed somewhere in the stream trace
    assert(trace.exists(_._5), "the hour-5 surge must alarm")
    assert(trace.count(_._1 == "late_type") == 7,
      "new type back-fills zero windows from the spine start")
    // replaying a folded batch id emits nothing (idempotence)
    assert(graft.streaming.EwmaStream.foldBatch(b1, state, 1L, "1 hour",
      horizon = 16, mult = 4L, guard = 4L).count() == 0)
    // a window behind the cursor fails loudly
    val late = ev(1, 3).toDF("event_id", "ts", "user_id", "event_type", "value")
    val e1 = intercept[IllegalArgumentException] {
      graft.streaming.EwmaStream.foldBatch(late, state, 2L, "1 hour",
        horizon = 16, mult = 4L, guard = 4L)
    }
    assert(e1.getMessage.contains("behind the cursor"))
    // folding with different knobs refuses instead of splicing charts
    val e2 = intercept[IllegalArgumentException] {
      graft.streaming.EwmaStream.foldBatch(b1, state, 3L, "1 hour",
        horizon = 8, mult = 4L, guard = 4L)
    }
    assert(e2.getMessage.contains("knobs"), e2.getMessage)
  }

  test("markov monitor: boundary pairs counted once, emission equals the batch matrix, replay/order guards") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mkvstream").toFile
    val state = new java.io.File(dir, "state").getPath
    val base = 1700000000000L
    def ts(i: Int) = new java.sql.Timestamp(base + i * 1000L)
    // user 1: A(0) B(1) | A(10) C(11)  -> boundary pair B->A
    // user 2: A(2)      | B(12)        -> boundary pair A->B
    val b0 = Seq((1L, ts(0), 1L, "A"), (2L, ts(1), 1L, "B"),
      (3L, ts(2), 2L, "A")).toDF("event_id", "ts", "user_id", "event_type")
    val b1 = Seq((4L, ts(10), 1L, "A"), (5L, ts(11), 1L, "C"),
      (6L, ts(12), 2L, "B")).toDF("event_id", "ts", "user_id", "event_type")
    graft.streaming.MarkovStream.foldBatch(b0, state, 0L,
      "user_id", "ts", "event_type", "event_id")
    val m1 = graft.streaming.MarkovStream.foldBatch(b1, state, 1L,
      "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type", "to_type").collect().map(_.toSeq)
    val expect = graft.ops.EventAnalytics.transitionMatrix(
        b0.unionByName(b1), col("user_id"), col("ts"), col("event_type"),
        col("event_id"))
      .orderBy("from_type", "to_type").collect().map(_.toSeq)
    assert(m1.toSeq == expect.toSeq,
      s"fold must equal the batch matrix:\n${m1.toSeq}\nvs\n${expect.toSeq}")
    // the two boundary pairs are present — a per-batch union drops them
    assert(expect.exists(r => r(0) == "B" && r(1) == "A"),
      "boundary pair B->A must be counted")
    // replaying a folded id emits nothing and changes nothing
    assert(graft.streaming.MarkovStream.foldBatch(b1, state, 1L,
      "user_id", "ts", "event_type", "event_id").count() == 0)
    val m2 = graft.streaming.MarkovStream.foldBatch(
        Seq.empty[(Long, java.sql.Timestamp, Long, String)]
          .toDF("event_id", "ts", "user_id", "event_type"),
        state, 2L, "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type", "to_type").collect().map(_.toSeq)
    assert(m2.toSeq == expect.toSeq, "empty batch re-emits the standing matrix")
    // an out-of-order batch refuses loudly
    val e = intercept[IllegalArgumentException] {
      graft.streaming.MarkovStream.foldBatch(b0, state, 3L,
        "user_id", "ts", "event_type", "event_id")
    }
    assert(e.getMessage.contains("event-time order"), e.getMessage)
  }

  test("sharded cusum fold: union of hash shards equals the unsharded trace") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cushard").toFile
    val stateU = new java.io.File(dir, "unsharded").getPath
    val stateS = new java.io.File(dir, "sharded").getPath
    val base = (1700000000000L / 3600000L) * 3600000L
    def ev(hour: Int, n: Int, tpe: String) =
      (1 to n).map(i => ((hour * 1000 + i).toLong,
        new java.sql.Timestamp(base + hour * 3600000L + i * 1000L), 1L, tpe, 1.0))
    // batch 0 carries two types; batch 1 adds FIVE types first seen
    // mid-stream — with 3 hash shards some of them land in shards
    // that were type-empty at batch 0, which is exactly the spine
    // coupling the shared-spine push exists for
    val b0 = (ev(0, 6, "a") ++ ev(1, 6, "a") ++ ev(2, 6, "a") ++ ev(0, 9, "b"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val b1 = (ev(5, 7, "a") ++ ev(4, 2, "b") ++
        Seq("c", "d", "e", "f", "g").flatMap(t => ev(5, 11, t)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // fixture guard: the mid-stream types must not all share shards
    // with a/b, or the test would never exercise the locked spine
    val shardOf = b1.select(col("event_type"),
        pmod(xxhash64(col("event_type")), lit(3)).as("sh"))
      .distinct().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch0Shards = Set(shardOf.getOrElse("a", -1L), shardOf.getOrElse("b", -1L))
    assert(Seq("c", "d", "e", "f", "g").exists(t => !batch0Shards(shardOf(t))),
      s"fixture lost its empty-shard case: $shardOf")
    val u = graft.streaming.CusumStream.foldBatch(b0, stateU, 0L, "1 hour", 4L, 8L)
      .unionByName(
        graft.streaming.CusumStream.foldBatch(b1, stateU, 1L, "1 hour", 4L, 8L))
      .orderBy("event_type", "wstart").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    val sh = graft.streaming.CusumStream
      .foldBatchSharded(b0, stateS, 0L, nShards = 3, "1 hour", 4L, 8L)
      .unionByName(graft.streaming.CusumStream
        .foldBatchSharded(b1, stateS, 1L, nShards = 3, "1 hour", 4L, 8L))
      .orderBy("event_type", "wstart").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(sh == u, s"sharded union must equal unsharded trace:\n$sh\nvs\n$u")
    // the mid-stream types back-filled from the GLOBAL spine (hour 0),
    // not their shard's own first-seen window: 6 windows each (0..5)
    Seq("c", "d", "e", "f", "g").foreach { t =>
      assert(sh.count(_._1 == t) == 6, s"$t backfill: ${sh.filter(_._1 == t)}")
    }
    // per-shard state files exist — independent, not one hot file
    // (versioned layout: _cusum_state.vNNNNNN.bin per publish)
    assert((0 until 3).count { i =>
      val d = new java.io.File(s"$stateS/shard=$i")
      d.exists() && d.listFiles().exists(f =>
        f.getName.startsWith("_cusum_state.") && f.getName.endsWith(".bin"))
    } == 3)
    // replay idempotence holds shard-wise too
    assert(graft.streaming.CusumStream
      .foldBatchSharded(b1, stateS, 1L, nShards = 3, "1 hour", 4L, 8L)
      .count() == 0)
  }

  test("hist sink: standing histogram and quantiles equal the batch grid over all folds") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_histsink").toString
    val b0 = (1 to 400).map(i => i.toDouble / 4.0).toDF("v")      // 0.25..100
    val b1 = (1 to 200).map(i => 100.0 + i.toDouble).toDF("v")    // 101..300
    val b2 = Seq(-5.0, 0.0, 499.99, 500.0, 1234.5).toDF("v")      // edges
    graft.streaming.HistStream.foldBatch(b0, col("v"), 0.0, 500.0, 50, dir, 0L)
    graft.streaming.HistStream.foldBatch(b1, col("v"), 0.0, 500.0, 50, dir, 1L)
    graft.streaming.HistStream.foldBatch(b2, col("v"), 0.0, 500.0, 50, dir, 2L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("bin").collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), r.getLong(3))).toSeq
    val standing = rows(graft.streaming.HistStream.standingHistogram(s, dir))
    val batch = rows(graft.ops.Profiling.gridHistogram(
      b0.unionByName(b1).unionByName(b2), col("v"), 0.0, 500.0, 50))
    assert(standing == batch, s"standing != batch grid:\n$standing\nvs\n$batch")
    // under/overflow mass landed where declared
    val m = standing.map(r => r._1 -> r._4).toMap
    assert(m(-1L) == 1L && m(50L) == 2L, s"clamp bins: $m")
    // replaying a folded batch id is a no-op (counts are not
    // idempotent by algebra — the batch-id guard does it)
    graft.streaming.HistStream.foldBatch(b1, col("v"), 0.0, 500.0, 50, dir, 1L)
    assert(rows(graft.streaming.HistStream.standingHistogram(s, dir)) == batch,
      "replay must not double-count")
    // standing quantiles == the batch histQuantiles over the union
    val qs = graft.streaming.HistStream
      .standingQuantiles(s, dir, Seq(0.1, 0.5, 0.9))
      .orderBy("p").collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val qb = graft.ops.Profiling.histQuantiles(
        graft.ops.Profiling.gridHistogram(
          b0.unionByName(b1).unionByName(b2), col("v"), 0.0, 500.0, 50),
        0.0, 500.0, 50, Seq(0.1, 0.5, 0.9))
      .orderBy("p").collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    assert(qs == qb, s"standing quantiles != batch: $qs vs $qb")
    // grid-read accuracy: estimates within one bin width (10.0) of the
    // exact quantiles of the 605-value stream
    val exact = graft.ops.Profiling.exactQuantiles(
        b0.unionByName(b1).unionByName(b2)
          .select(greatest(least(col("v"), lit(500.0)), lit(0.0)).as("v")),
        col("v"), Seq(0.1, 0.5, 0.9))
      .orderBy("p").collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    qs.zip(exact).foreach { case ((p1, est), (p2, ex)) =>
      assert(p1 == p2 && math.abs(est - ex) <= 10.0 + 1e-9,
        s"grid estimate at p=$p1: $est vs exact $ex")
    }
    // a mismatched grid fails loudly instead of corrupting counts
    val e = intercept[IllegalArgumentException] {
      graft.streaming.HistStream.foldBatch(b0, col("v"), 0.0, 400.0, 50, dir, 3L)
    }
    assert(e.getMessage.contains("grids must match"))
  }

  test("keyed hist sink: per-stratum standing grids equal the batch gridBy; replay guarded") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_histbysink").toString
    val b0 = (1 to 100).map(i => ("lat", i.toDouble)).toDF("k", "v")
    val b1 = ((1 to 50).map(i => ("lat", 200.0 + i)) ++
      (1 to 40).map(i => ("err", i * 2.0))).toDF("k", "v")
    graft.streaming.HistStream.foldBatchBy(b0, col("k"), col("v"),
      0.0, 400.0, 40, dir, 0L)
    graft.streaming.HistStream.foldBatchBy(b1, col("k"), col("v"),
      0.0, 400.0, 40, dir, 1L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("key", "bin").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    val standing = rows(graft.streaming.HistStream
      .standingHistogramBy(s, dir))
    val batch = graft.ops.Profiling.gridHistogramBy(
        b0.unionByName(b1).withColumnRenamed("k", "key"), Seq("key"),
        col("v"), 0.0, 400.0, 40)
      .orderBy("key", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    assert(standing == batch, s"standing != batch gridBy:\n$standing\nvs\n$batch")
    // replay is a no-op
    graft.streaming.HistStream.foldBatchBy(b1, col("k"), col("v"),
      0.0, 400.0, 40, dir, 1L)
    assert(rows(graft.streaming.HistStream.standingHistogramBy(s, dir)) == batch)
    // per-key standing quantiles: a key seen in one batch only ("err")
    // reads its own grid, not the mixed stream's
    val q = graft.streaming.HistStream
      .standingQuantilesBy(s, dir, Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(q("err") > 0.0 && q("err") <= 90.0, s"err p50 in its own grid: $q")
    assert(q("lat") > 40.0 && q("lat") <= 260.0, s"lat p50 spans both batches: $q")
  }

  test("standingPsi: drift between two standing grids equals the batch histPsi; self-psi is 0") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_histpsi").toString
    val refDir = s"$base/ref"; val curDir = s"$base/cur"
    val ref = (1 to 500).map(i => (i % 100).toDouble).toDF("v")
    val cur = (1 to 500).map(i => ((i % 100) + 30).toDouble).toDF("v") // shifted
    graft.streaming.HistStream.foldBatch(ref, col("v"), 0.0, 200.0, 20, refDir, 0L)
    graft.streaming.HistStream.foldBatch(cur, col("v"), 0.0, 200.0, 20, curDir, 0L)
    val standing = graft.streaming.HistStream.standingPsi(s, refDir, curDir)
      .collect()(0)
    val batch = graft.ops.Profiling.histPsi(
        graft.ops.Profiling.gridHistogram(ref, col("v"), 0.0, 200.0, 20),
        graft.ops.Profiling.gridHistogram(cur, col("v"), 0.0, 200.0, 20),
        bins = 20)
      .collect()(0)
    assert(standing.getDouble(0) == batch.getDouble(0),
      s"standing psi ${standing.getDouble(0)} != batch ${batch.getDouble(0)}")
    // the shift is a real drift; identical dists read ~0
    assert(batch.getDouble(0) > 0.1, s"shifted dist must drift: $batch")
    val self = graft.ops.Profiling.histPsi(
        graft.ops.Profiling.gridHistogram(ref, col("v"), 0.0, 200.0, 20),
        graft.ops.Profiling.gridHistogram(ref, col("v"), 0.0, 200.0, 20),
        bins = 20)
      .collect()(0).getDouble(0)
    assert(self == 0.0, s"self-psi must be exactly 0: $self")
    // mismatched grids fail loudly
    val other = s"$base/other"
    graft.streaming.HistStream.foldBatch(ref, col("v"), 0.0, 100.0, 20, other, 0L)
    val e = intercept[IllegalArgumentException] {
      graft.streaming.HistStream.standingPsi(s, refDir, other)
    }
    assert(e.getMessage.contains("grids differ"))
  }

  test("standingPsiBy: per-key drift between keyed standing grids equals batch histPsiBy") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_histpsiby").toString
    val refDir = s"$base/ref"; val curDir = s"$base/cur"
    val ref = ((1 to 200).map(i => ("en", (i % 100).toDouble)) ++
      (1 to 100).map(i => ("de", (i % 50).toDouble))).toDF("k", "v")
    // en drifts (shifted), de stays identical
    val cur = ((1 to 200).map(i => ("en", (i % 100) + 40.0)) ++
      (1 to 100).map(i => ("de", (i % 50).toDouble))).toDF("k", "v")
    graft.streaming.HistStream.foldBatchBy(ref, col("k"), col("v"),
      0.0, 200.0, 20, refDir, 0L)
    graft.streaming.HistStream.foldBatchBy(cur, col("k"), col("v"),
      0.0, 200.0, 20, curDir, 0L)
    val standing = graft.streaming.HistStream.standingPsiBy(s, refDir, curDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = graft.ops.Profiling.histPsiBy(
        graft.ops.Profiling.gridHistogramBy(
          ref.withColumnRenamed("k", "key"), Seq("key"), col("v"), 0.0, 200.0, 20),
        graft.ops.Profiling.gridHistogramBy(
          cur.withColumnRenamed("k", "key"), Seq("key"), col("v"), 0.0, 200.0, 20),
        "key", 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(standing == batch, s"standing $standing != batch $batch")
    assert(standing("de") == 0.0, s"identical stratum must read exactly 0: $standing")
    assert(standing("en") > 0.1, s"shifted stratum must drift: $standing")
  }

  test("heavy-hitter sink folds micro-batches into one standing MG summary") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_mgsink").toFile
    val state = new java.io.File(dir, "mg").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val input = MemoryStream[String]
    val query = graft.streaming.HeavyHitterStream.heavyHitterSink(
        input.toDS().toDF("s"), org.apache.spark.sql.functions.col("s"),
        k = 8, dir = state)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(Seq.fill(30)("hot") ++ Seq("a", "b", "c"): _*)
      query.processAllAvailable()
      input.addData(Seq.fill(20)("hot") ++ Seq.fill(10)("warm") ++ Seq("d"): _*)
      query.processAllAvailable()
      val out = graft.streaming.HeavyHitterStream
        .standingSummary(s, state, k = 8)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // exact regime across both batches: 7 distinct keys < k=8
      assert(out.map(e => e._1 -> e._2).toMap ==
        Map("hot" -> 50L, "warm" -> 10L, "a" -> 1L, "b" -> 1L,
          "c" -> 1L, "d" -> 1L))
      assert(out.forall(_._3 == 0L))
      // est desc, item asc ordering from the standing read
      assert(out.head._1 == "hot")
      // replaying an already-merged batch id is a no-op (idempotence)
      graft.streaming.HeavyHitterStream.mergeBatch(
        Seq.fill(100)("hot").toDF("s"),
        org.apache.spark.sql.functions.col("s"), k = 8, dir = state,
        batchId = 1L)
      val replayed = graft.streaming.HeavyHitterStream
        .standingSummary(s, state, k = 8)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(replayed("hot") == 50L, s"replay must not double-count: $replayed")
    } finally query.stop()

    // adversarial k on the driver-side merge: guarantees survive
    val a = Seq(("hot", 40L), ("x1", 3L), ("x2", 3L))
    val b = Seq(("hot", 30L), ("warm", 25L), ("y1", 4L))
    val merged = graft.streaming.HeavyHitterStream.mergeSummaries(a, b, k = 2)
    assert(merged.size <= 2)
    val m = merged.toMap
    assert(m.contains("hot") && m.contains("warm"), s"heavies must survive: $m")
    assert(m("hot") <= 70L && m("warm") <= 25L, s"never over-count: $m")
  }

  test("clustered sink: first batch establishes the grid, later batches append clustered files") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_csink").toFile
    val path = new java.io.File(dir, "tbl").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val input = MemoryStream[(Long, Long)]
    val query = graft.streaming.ClusteredSink.clusteredSink(
        input.toDS().toDF("x", "y"), path, Seq("x", "y"), bits = 8,
        filesPerBatch = 4, gridBounds = Seq((0L, 255L), (0L, 255L)))
      .option("checkpointLocation", ckpt).start()
    try {
      def files(): Int = new java.io.File(path).listFiles()
        .count(_.getName.endsWith(".parquet"))
      input.addData((0L until 256L).map(i => (i, 255L - i)): _*)
      query.processAllAvailable()
      assert(new java.io.File(s"$path/_zorder_meta.json").exists(),
        "first batch must establish the grid")
      val afterFirst = files()
      assert(afterFirst == 4, s"first batch writes filesPerBatch files: $afterFirst")
      input.addData((0L until 256L).map(i => (255L - i, i)): _*)
      query.processAllAvailable()
      assert(files() == afterFirst + 4,
        s"second batch appends filesPerBatch new files: ${files()}")
      // lossless across both batches; both dimensions still scan
      val back = s.read.parquet(path)
      assert(back.count() == 512)
      assert(back.agg(org.apache.spark.sql.functions.sum("x")).head().getLong(0)
        == 2L * (0L until 256L).sum)
      // every file's footer box is bounded (clustered, not arbitrary):
      // a y-box touches at most 6 of the 8 files
      val fs = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val touched = fs.count { f =>
        val r = s.read.parquet(f)
          .agg(org.apache.spark.sql.functions.min("y"),
            org.apache.spark.sql.functions.max("y")).head()
        !(r.getLong(1) < 40L || r.getLong(0) > 80L)
      }
      assert(touched * 4 <= fs.length * 3,
        s"clustered layout must bound per-file y ranges: $touched/${fs.length}")
    } finally query.stop()
  }

  test("hilbert clustered sink: appended batches stay box-prunable across old+new files") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_hsink").toFile
    val path = new java.io.File(dir, "tbl").getPath
    val ckpt = new java.io.File(dir, "ckpt").getPath
    val input = MemoryStream[(Long, Long)]
    val query = graft.streaming.ClusteredSink.clusteredSinkHilbert(
        input.toDS().toDF("x", "y"), path, Seq("x", "y"), bits = 8,
        filesPerBatch = 4, gridBounds = Seq((0L, 255L), (0L, 255L)))
      .option("checkpointLocation", ckpt).start()
    try {
      def files(): Array[String] = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      input.addData((0L until 256L).map(i => (i, 255L - i)): _*)
      query.processAllAvailable()
      assert(new java.io.File(s"$path/_hilbert_meta.json").exists(),
        "first batch must establish the hilbert grid")
      assert(files().length == 4)
      input.addData((0L until 256L).map(i => (255L - i, i)): _*)
      query.processAllAvailable()
      assert(files().length == 8,
        s"second batch appends filesPerBatch new files: ${files().length}")
      // second batch APPENDED (the always-false java.io.File existence
      // check regression would overwrite batch 1 here)
      val back = s.read.parquet(path)
      assert(back.count() == 512, "append must preserve earlier batches")
      // box-prunable across old AND new files: both batches clustered
      // on the SAME stored curve, so a y-box still skips most files
      val touched = files().count { f =>
        val r = s.read.parquet(f)
          .agg(org.apache.spark.sql.functions.min("y"),
            org.apache.spark.sql.functions.max("y")).head()
        !(r.getLong(1) < 40L || r.getLong(0) > 80L)
      }
      assert(touched * 4 <= files().length * 3,
        s"hilbert layout must bound per-file y ranges: $touched/${files().length}")
    } finally query.stop()
  }

  test("manifest sink: exactly-once appends — replays no-op, readers never see torn batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_manifestsink").toFile
    val path = new java.io.File(base, "tbl").getPath
    val ckpt = new java.io.File(base, "ckpt").getPath
    val input = MemoryStream[Long]
    val query = graft.streaming.ManifestSink.sink(
        input.toDS().toDF("id"), path, filesPerBatch = 2)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(1L to 100L: _*)
      query.processAllAvailable()
      input.addData(101L to 150L: _*)
      query.processAllAvailable()
    } finally query.stop()
    val conf = s.sessionState.newHadoopConf()
    assert(graft.streaming.ManifestSink.read(s, path).count() == 150)
    val publishedId = graft.streaming.ManifestSink.lastBatchId(conf, path)
    assert(publishedId >= 1L)
    // the crash-replay: foreachBatch re-delivers an already-published
    // batch id — the manifest's standing '#batch' absorbs it
    graft.streaming.ManifestSink.appendBatch(
      (101L to 150L).toDF("id"), path, publishedId)
    assert(graft.streaming.ManifestSink.read(s, path).count() == 150,
      "replayed batch must not double-append")
    // a genuinely new batch appends atomically under a racing reader:
    // every read is a whole-batch count, never a partial file set
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val reader = new Thread(() => {
      try {
        while (!stop.get())
          observed.add(graft.streaming.ManifestSink.read(s, path).count())
      } catch { case t: Throwable => failed.set(t) }
    })
    reader.start()
    try {
      graft.streaming.ManifestSink.appendBatch(
        (151L to 250L).toDF("id"), path, publishedId + 1, filesPerBatch = 4)
    } finally { stop.set(true); reader.join(30000) }
    assert(failed.get() == null, s"racing read failed: ${failed.get()}")
    import scala.jdk.CollectionConverters._
    val torn = observed.asScala.toSeq.filterNot(c => c == 150L || c == 250L)
    assert(torn.isEmpty, s"torn append visible: ${torn.take(3)}")
    val all = graft.streaming.ManifestSink.read(s, path)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(all == (1L to 250L), "exactly the stream's rows, exactly once")
    assert(graft.streaming.ManifestSink.lastBatchId(conf, path) == publishedId + 1)
    // meta lines don't leak into the file list or time travel
    val names = graft.sources.Sources.readManifest(conf, path).get
    assert(names.forall(_.endsWith(".parquet")), names.toString)
    val vs = graft.sources.Sources.manifestLogVersions(conf, path)
    assert(graft.sources.Sources
      .readManifestedAt(s, path, vs.head).count() == 100,
      "first published batch stays time-travelable")
  }

  test("upsert sink: a CDC stream merges exactly-once at the file grain") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_upsertsink").toFile
    val path = new java.io.File(base, "tbl").getPath
    val ckpt = new java.io.File(base, "ckpt").getPath
    val input = MemoryStream[(Long, Long, String)]
    val query = graft.streaming.ManifestSink.upsertSink(
        input.toDS().toDF("id", "price", "op"), path, id = "id")
      .option("checkpointLocation", ckpt).start()
    try {
      // batch 0 bootstraps the table from its upserts
      input.addData((1L to 50L).map(i => (i, i * 10L, "upsert")): _*)
      query.processAllAvailable()
      // batch 1: update 5, delete 10, insert 51
      input.addData((5L, 555L, "upsert"), (10L, 0L, "delete"),
        (51L, 510L, "upsert"))
      query.processAllAvailable()
    } finally query.stop()
    val conf = s.sessionState.newHadoopConf()
    val got = graft.streaming.ManifestSink.read(s, path)
    assert(got.count() == 50)
    assert(got.filter(col("id") === 5L).head().getLong(1) == 555L)
    assert(got.filter(col("id") === 10L).isEmpty)
    assert(got.filter(col("id") === 51L).head().getLong(1) == 510L)
    // the batch id advanced ATOMICALLY with the merge's publish
    val publishedId = graft.streaming.ManifestSink.lastBatchId(conf, path)
    assert(publishedId == 1L)
    // crash-replay of the merge batch: the id guard absorbs it before
    // any file work (no new version, same state)
    val vHead = graft.sources.Sources.manifestLogVersions(conf, path).last
    graft.streaming.ManifestSink.upsertBatch(
      Seq((5L, 555L, "upsert"), (10L, 0L, "delete"), (51L, 510L, "upsert"))
        .toDF("id", "price", "op"), path, publishedId, id = "id")
    assert(graft.sources.Sources.manifestLogVersions(conf, path).last == vHead,
      "replayed batch must not publish")
    assert(graft.streaming.ManifestSink.read(s, path).count() == 50)
    // pre-merge state stays time-travelable
    val v1 = graft.sources.Sources.manifestLogVersions(conf, path).head
    val at1 = graft.sources.Sources.readManifestedAt(s, path, v1)
    assert(at1.count() == 50 &&
      at1.filter(col("id") === 5L).head().getLong(1) == 50L)
  }

  test("state envelope: pre-envelope bytes and cross-family state fail loudly") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_envelope").toString
    val conf = s.sessionState.newHadoopConf()
    // a pre-envelope (or foreign) file: plausible-looking doubles/ints
    // that the old reader would have consumed as garbage lengths
    val foreign = new java.io.File(base, "foreign")
    foreign.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(foreign, "_hist_state.bin").toPath,
      Array.fill[Byte](64)(7))
    val e1 = intercept[IllegalArgumentException] {
      graft.streaming.HistStream.readState(conf, foreign.getPath)
    }
    assert(e1.getMessage.contains("older graft version") ||
      e1.getMessage.contains("no graft envelope"), e1.getMessage)
    // a DIFFERENT family's enveloped state under this family's file
    // name: rejected by family tag, not misparsed
    val cusumDir = s"$base/cusum"
    graft.streaming.CusumStream.foldBatch(
      Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .toDF("event_type", "ts"),
      cusumDir, 0L, windowLen = "1 hour", k = 1L, h = 2L)
    val crossDir = new java.io.File(base, "cross")
    crossDir.mkdirs()
    // latest versioned cusum state, planted under hist's LEGACY fixed
    // name (the fallback read path) — family arbitration must still fire
    val cusumState = new java.io.File(cusumDir).listFiles()
      .filter(f => f.getName.startsWith("_cusum_state.") &&
        f.getName.endsWith(".bin")).maxBy(_.getName)
    java.nio.file.Files.copy(cusumState.toPath,
      new java.io.File(crossDir, "_hist_state.bin").toPath)
    val e2 = intercept[IllegalArgumentException] {
      graft.streaming.HistStream.readState(conf, crossDir.getPath)
    }
    assert(e2.getMessage.contains("family 'cusum'"), e2.getMessage)
    // version round-trip: what the writer emits, the reader speaks
    graft.streaming.HistStream.foldBatch(Seq(1.0, 2.0).toDF("v"), col("v"),
      0.0, 10.0, 5, s"$base/ok", 0L)
    val (_, _, bins, _, _) =
      graft.streaming.HistStream.readState(conf, s"$base/ok")
    assert(bins == 5)
    // KMV's text envelope: a header-less file is rejected, a real one
    // round-trips
    val kmvDir = s"$base/kmv"
    graft.streaming.KmvStream.foldBatch(
      Seq("x", "y", "z").toDF("s"), col("s"), k = 2, kmvDir)
    assert(graft.streaming.KmvStream.readState(conf, kmvDir)._1 == 2)
    val badKmv = new java.io.File(base, "badkmv")
    badKmv.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(badKmv, "_kmv_state.txt").toPath,
      "2\nabc\ndef".getBytes("UTF-8"))
    val e3 = intercept[IllegalArgumentException] {
      graft.streaming.KmvStream.readState(conf, badKmv.getPath)
    }
    assert(e3.getMessage.contains("older graft version"), e3.getMessage)
  }

  test("cusum monitor: direction flip and shard-count change fail loudly") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cusumguard").toString
    def batch(h: Int) = (1 to 6).map(i =>
      ("a", java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")))
      .toDF("event_type", "ts")
    val dir1 = s"$base/updown"
    graft.streaming.CusumStream.foldBatch(batch(0), dir1, 0L,
      windowLen = "1 hour", k = 4L, h = 8L, direction = "up")
    val e1 = intercept[IllegalArgumentException] {
      graft.streaming.CusumStream.foldBatch(batch(1), dir1, 1L,
        windowLen = "1 hour", k = 4L, h = 8L, direction = "down")
    }
    assert(e1.getMessage.contains("direction"), e1.getMessage)
    // same direction keeps folding fine
    graft.streaming.CusumStream.foldBatch(batch(1), dir1, 1L,
      windowLen = "1 hour", k = 4L, h = 8L, direction = "up")
    // sharded: nShards persisted at the parent dir, change rejected
    val dir2 = s"$base/sharded"
    graft.streaming.CusumStream.foldBatchSharded(batch(0), dir2, 0L,
      nShards = 2, windowLen = "1 hour", k = 4L, h = 8L)
    val e2 = intercept[IllegalArgumentException] {
      graft.streaming.CusumStream.foldBatchSharded(batch(1), dir2, 1L,
        nShards = 3, windowLen = "1 hour", k = 4L, h = 8L)
    }
    assert(e2.getMessage.contains("nShards"), e2.getMessage)
    graft.streaming.CusumStream.foldBatchSharded(batch(1), dir2, 1L,
      nShards = 2, windowLen = "1 hour", k = 4L, h = 8L)
  }

  test("keyed hist fold: NULL stratum keys dropped like null values; non-null strata exact") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_histnull").toString
    val withNulls = (Seq(("lat", 10.0), (null, 20.0), ("lat", 30.0),
      (null, 40.0), ("err", 50.0))).toDF("k", "v")
    // must not NPE (r13 advice: null key rode through gridHistogramBy's
    // groupBy into the state write's string sort)
    graft.streaming.HistStream.foldBatchBy(withNulls, col("k"), col("v"),
      0.0, 100.0, 10, dir, 0L)
    val standing = graft.streaming.HistStream.standingHistogramBy(s, dir)
      .orderBy("key", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    val batchNoNull = graft.ops.Profiling.gridHistogramBy(
        withNulls.filter(col("k").isNotNull).withColumnRenamed("k", "key"),
        Seq("key"), col("v"), 0.0, 100.0, 10)
      .orderBy("key", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    assert(standing == batchNoNull,
      s"null-key rows must be dropped, others exact:\n$standing\nvs\n$batchNoNull")
    assert(standing.map(_._1).toSet == Set("lat", "err"))
  }

  test("histPsi: an empty side reads the defined all-smoothing drift, never NULL") {
    val s = spark
    import s.implicits._
    val ref = graft.ops.Profiling.gridHistogram(
      (1 to 100).map(_.toDouble).toDF("v"), col("v"), 0.0, 100.0, 10)
    val empty = graft.ops.Profiling.gridHistogram(
      Seq.empty[Double].toDF("v"), col("v"), 0.0, 100.0, 10)
    val r = graft.ops.Profiling.histPsi(ref, empty, 10).collect()(0)
    // > 0.25 is the scorecard "significant drift" line; smoothing
    // bounds how far a finite-count one-sided read can go
    assert(!r.isNullAt(0) && r.getDouble(0) > 0.25,
      s"empty cur must read strong one-sided drift: $r")
    assert(r.getLong(1) == 100L && r.getLong(2) == 0L, r.toString)
    // and matches histPsiBy's convention for a one-sided key
    val psiBy = graft.ops.Profiling.histPsiBy(
        graft.ops.Profiling.gridHistogramBy(
          (1 to 100).map(i => ("k", i.toDouble)).toDF("key", "v"),
          Seq("key"), col("v"), 0.0, 100.0, 10),
        graft.ops.Profiling.gridHistogramBy(
          Seq.empty[(String, Double)].toDF("key", "v"),
          Seq("key"), col("v"), 0.0, 100.0, 10),
        "key", 10)
      .collect()(0)
    assert(math.abs(psiBy.getDouble(1) - r.getDouble(0)) < 1e-12,
      s"histPsi ${r.getDouble(0)} != histPsiBy ${psiBy.getDouble(1)}")
  }

  test("trend reads over the windowed monitor sink: mannKendall + theilSen flag the drifting type") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[SessionEvent]
    val agg = EventStreams.windowedAgg(input.toDF(), "1 hour",
      watermark = Some("10 minutes"))
    val query = agg.writeStream.format("memory")
      .queryName("trend_out").outputMode("append").start()
    try {
      // 8 hourly windows: "grow" drifts up 1,2,…,8/hour (a source
      // quietly ramping); "flat" alternates 3,4 (healthy noise)
      var id = 0L
      for (h <- 0 until 8) {
        val growN = h + 1
        val flatN = if (h % 2 == 0) 3 else 4
        input.addData(
          (0 until growN).map { k =>
            id += 1; SessionEvent(id, ts(h * 60 + k), 1L, "grow", 1.0)
          } ++ (0 until flatN).map { k =>
            id += 1; SessionEvent(id, ts(h * 60 + 30 + k), 2L, "flat", 1.0)
          }: _*)
        query.processAllAvailable()
      }
      // sentinel far past hour 7 + watermark: all 8 windows finalize
      id += 1
      input.addData(SessionEvent(id, ts(600), 3L, "late", 1.0))
      query.processAllAvailable()
      val sink = s.table("trend_out")
      assert(sink.filter(col("event_type") === "grow").count() == 8)
      // the monitor's sink table IS mannKendall/theilSen's input —
      // the composition a standing drift alert runs every morning
      val hourly = sink.select(col("event_type"),
        (unix_timestamp(col("wstart")) / 3600L).cast("long").as("h"),
        col("n"))
      val mk = graft.ops.Profiling.mannKendall(hourly,
          col("event_type"), col("h"), col("n"))
        .collect().map(r => r.getString(0) -> r).toMap
      // grow: monotone n=8 -> S=28, var=65.33, z=3.34 — fires at 5%
      assert(mk("grow").getAs[Double]("z") > 1.96, mk("grow").toString)
      // flat: alternating ties -> S=4, var=48, z=0.43 — must NOT fire
      assert(math.abs(mk("flat").getAs[Double]("z")) < 1.96,
        mk("flat").toString)
      val sen = graft.ops.Profiling.theilSen(hourly,
          col("event_type"), col("h"), col("n"))
        .collect().map(r => r.getString(0) -> r).toMap
      // the drift RATE reads exactly +1 doc/hour off the linear ramp
      assert(sen("grow").getAs[Double]("slope") == 1.0,
        sen("grow").toString)
    } finally query.stop()
  }
}
