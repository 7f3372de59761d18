package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{KeyedEvent, StreamingOps}
import graft.operators.{Joins, Keyed, Windows}

/** Streaming↔batch parity: the streaming operators must produce the
  * batch operators' results on the same data — the batch engine is the
  * ground truth the DuckDB oracle already verified.
  */
class StreamingParitySpec extends SparkSpecBase {

  private def mkEvents: Seq[KeyedEvent] = Seq(
    KeyedEvent(1L, 1_000_000L, 10.0), KeyedEvent(1L, 61_000_000L, 20.0),
    KeyedEvent(1L, 62_000_000L, 30.0), KeyedEvent(1L, 200_000_000L, 40.0),
    KeyedEvent(2L, 5_000_000L, 5.0), KeyedEvent(2L, 65_000_000L, 15.0))

  private def streamOf(events: Seq[KeyedEvent]): MemoryStream[KeyedEvent] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    ms.addData(events)
    ms
  }

  private def runToTable(df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("watermarked tumbling window matches batch tumbling") {
    import spark.implicits._
    val events = mkEvents
    val sdf = streamOf(events).toDF()
      .withColumn("ts", timestamp_micros(col("tsUs")))
    val agg = StreamingOps.tumbling(sdf, "ts", Seq("key"), "1 minute", "10 seconds")(
      count(lit(1)).as("n"), sum(col("value")).as("sv"))
    runToTable(agg, "t_tumbling", OutputMode.Complete())
    val got = spark.table("t_tumbling")
      .select(unix_micros(col("window_start")).as("ws"), col("key"), col("n"), col("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    val bdf = events.toDF().withColumn("ts", timestamp_micros(col("tsUs")))
    val expect = Windows.tumbling(bdf, "ts", Seq("key"), "1 minute")(
      count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(unix_micros(col("window_start")), col("key"), col("n"), col("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect)
  }

  test("stateful lagWindow matches batch lagWindow") {
    import spark.implicits._
    val events = mkEvents
    val out = StreamingOps.lagWindow(streamOf(events).toDS(), 2)
    runToTable(out.toDF(), "t_lag", OutputMode.Append())
    val got = spark.table("t_lag")
      .select(col("key"), col("tsUs"), col("values"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toList)).toSet

    val bdf = events.toDF().withColumn("ts", timestamp_micros(col("tsUs")))
    val expect = Windows.lagWindow(bdf, Seq("key"), Seq("tsUs"), "value", 2)
      .select(col("key"), col("tsUs"), col("v_1"), col("v_0"))
      .collect().map(r => (r.getLong(0), r.getLong(1), List(r.getDouble(2), r.getDouble(3)))).toSet
    assert(got == expect)
  }

  test("append-mode tumbling drops events arriving later than the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val sdf = ms.toDF().withColumn("ts", timestamp_micros(col("tsUs")))
    val out = StreamingOps.tumbling(sdf, "ts", Seq("key"), "1 minute", "10 seconds")(
      count(lit(1)).as("n"))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("t_late").start()
    try {
      // batch 1: one event in [0,60s) + one at 200s advancing the
      // watermark to 190s, which closes and emits the first window
      ms.addData(Seq(KeyedEvent(1L, 1_000_000L, 1.0), KeyedEvent(1L, 200_000_000L, 1.0)))
      q.processAllAvailable()
      // batch 2: a LATE event for the closed [0,60s) window (30s < wm)
      // must be dropped; 400s advances the watermark to finalize [180,240s)
      ms.addData(Seq(KeyedEvent(1L, 30_000_000L, 99.0), KeyedEvent(1L, 400_000_000L, 1.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_late")
      .select(unix_micros(col("window_start")).as("ws"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.get(0L).contains(1L), s"late event leaked into the closed window: $rows")
    assert(rows.get(180_000_000L).contains(1L), rows.toString)
    // the 400s event's own window is still open (wm 390s < 420s) — not emitted
    assert(!rows.contains(360_000_000L), rows.toString)
  }

  test("hopping and session windows also drop late arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // hopping: the late 30s event must not reach the closed [0,60s) window
    val msH = MemoryStream[KeyedEvent]
    val hop = StreamingOps.hopping(
      msH.toDF().withColumn("ts", timestamp_micros(col("tsUs"))),
      "ts", Seq("key"), "1 minute", "15 seconds", "10 seconds")(count(lit(1)).as("n"))
    val qh = hop.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("t_hop_late").start()
    try {
      msH.addData(Seq(KeyedEvent(1L, 1_000_000L, 1.0), KeyedEvent(1L, 200_000_000L, 1.0)))
      qh.processAllAvailable()
      msH.addData(Seq(KeyedEvent(1L, 30_000_000L, 9.0), KeyedEvent(1L, 400_000_000L, 1.0)))
      qh.processAllAvailable()
    } finally qh.stop()
    val hopRows = spark.table("t_hop_late")
      .select(unix_micros(col("window_start")).as("ws"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hopRows.get(0L).contains(1L), s"late event leaked into hopping window: $hopRows")

    // session: the late 10s event must not reopen/extend the closed session
    val msS = MemoryStream[KeyedEvent]
    val ses = StreamingOps.session(
      msS.toDF().withColumn("ts", timestamp_micros(col("tsUs"))),
      "ts", Seq("key"), "30 seconds", "10 seconds")(count(lit(1)).as("n"))
    val qs = ses.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("t_ses_late").start()
    try {
      msS.addData(Seq(KeyedEvent(1L, 1_000_000L, 1.0), KeyedEvent(1L, 5_000_000L, 1.0),
        KeyedEvent(1L, 300_000_000L, 1.0)))
      qs.processAllAvailable()
      msS.addData(Seq(KeyedEvent(1L, 10_000_000L, 9.0), KeyedEvent(1L, 600_000_000L, 1.0)))
      qs.processAllAvailable()
    } finally qs.stop()
    val sesRows = spark.table("t_ses_late")
      .select(unix_micros(col("session_start")).as("ss"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sesRows.get(1_000_000L).contains(2L),
      s"late event leaked into the closed session: $sesRows")
  }

  test("changelog tableLatest matches batch latestByKey") {
    import spark.implicits._
    val events = mkEvents
    val out = StreamingOps.tableLatest(streamOf(events).toDS())
    runToTable(out.toDF(), "t_latest", OutputMode.Update())
    // latest update per key in the sink is the table snapshot
    val got = spark.table("t_latest")
      .groupBy("key").agg(max_by(struct(col("tsUs"), col("value")), col("tsUs")).as("s"))
      .select(col("key"), col("s.tsUs"), col("s.value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val bdf = events.toDF()
    val expect = Keyed.latestByKey(bdf, Seq("key"), Seq("tsUs"))
      .select("key", "tsUs", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect)
  }

  test("stream-static bucketedRangeJoin matches batch, stateless across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ranges = Seq(("neg", -20L, -10L), ("low", 0L, 10L), ("mid", 5L, 99L))
      .toDF("name", "lo", "hi")
    val b1 = Seq((1L, -15L), (2L, 0L), (3L, 10L))
    val b2 = Seq((4L, 99L), (5L, 250L))

    val ms = MemoryStream[(Long, Long)]
    val out = Joins.bucketedRangeJoin(ms.toDF().toDF("id", "v"), "v", ranges, "lo", "hi", 7L)
    val q = out.writeStream.format("memory").queryName("t_rrj")
      .outputMode(OutputMode.Append()).start()
    ms.addData(b1); q.processAllAvailable()   // the fact bucket is map-only,
    ms.addData(b2); q.processAllAvailable()   // so the join is stateless: no
    q.stop()                                  // watermark, batches independent

    val got = spark.table("t_rrj").select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expect = Joins.bucketedRangeJoin((b1 ++ b2).toDF("id", "v"), "v", ranges, "lo", "hi", 7L)
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expect && got.nonEmpty, s"got=$got expect=$expect")
  }

  test("stream-stream interval join matches batch intervalJoin") {
    import spark.implicits._
    val le = mkEvents
    val re = mkEvents.map(e => e.copy(tsUs = e.tsUs + 30_000_000L))
    val ls = streamOf(le).toDF().select(col("key").as("lk"),
      timestamp_micros(col("tsUs")).as("lts"), col("tsUs").as("ltus"))
    val rs = streamOf(re).toDF().select(col("key").as("rk"),
      timestamp_micros(col("tsUs")).as("rts"), col("tsUs").as("rtus"))
    val j = StreamingOps.intervalJoin(ls, rs, "lk", "rk", "lts", "rts", "1 MINUTE", "10 seconds")
    runToTable(j, "t_ivj", OutputMode.Append())
    val got = spark.table("t_ivj").select("ltus", "rtus")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lb = le.toDF().select(col("key").as("lk"), timestamp_micros(col("tsUs")).as("lts"), col("tsUs").as("ltus"))
    val rb = re.toDF().select(col("key").as("rk"), timestamp_micros(col("tsUs")).as("rts"), col("tsUs").as("rtus"))
    val expect = Joins.intervalJoin(lb, rb, "lk", "rk", "lts", "rts", 60_000_000L)
      .select("ltus", "rtus").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("watermarked session window matches batch session window") {
    import spark.implicits._
    val events = mkEvents
    val sdf = streamOf(events).toDF().withColumn("ts", timestamp_micros(col("tsUs")))
    val agg = StreamingOps.session(sdf, "ts", Seq("key"), "2 minutes", "10 seconds")(
      count(lit(1)).as("n"), sum(col("value")).as("sv"))
    runToTable(agg, "t_session", OutputMode.Complete())
    val got = spark.table("t_session")
      .select(col("key"), unix_micros(col("session_start")).as("ss"), col("n"), col("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    val bdf = events.toDF().withColumn("ts", timestamp_micros(col("tsUs")))
    val expect = Windows.session(bdf, "ts", Seq("key"), "2 minutes")(
      count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("key"), unix_micros(col("session_start")), col("n"), col("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expect)
  }

  test("streaming word count (reference tpipe pipeline) matches batch q_wordcount semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[String]
    ms.addData(Seq("The (quick), brown fox.", "the quick RED fox; jumps"))
    val counts = ms.toDF().toDF("text")
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    runToTable(counts, "t_wc", OutputMode.Complete())
    val got = spark.table("t_wc").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("the" -> 2L, "quick" -> 2L, "fox" -> 2L, "brown" -> 1L,
      "red" -> 1L, "jumps" -> 1L))
  }

  test("parquet stream sink + foreachBatch sink round-trip") {
    import spark.implicits._
    import graft.sinks.Sinks
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val sdf = streamOf(mkEvents).toDF()
    val q = Sinks.parquetStream(sdf, s"$dir/data", s"$dir/ckpt")
    q.awaitTermination()
    assert(spark.read.parquet(s"$dir/data").count() == mkEvents.size)

    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q2 = Sinks.foreachBatch(streamOf(mkEvents).toDF()) { (batch, _) =>
      seen.addAndGet(batch.count())
    }
    q2.awaitTermination()
    assert(seen.get() == mkEvents.size)
  }

  test("streaming candle+strat pipeline matches batch q_strat_classify semantics") {
    import spark.implicits._
    // 3 full windows per key (window = 60s), distinct values per tick
    val events = Seq(
      KeyedEvent(1L, 1_000_000L, 10.0), KeyedEvent(1L, 30_000_000L, 14.0),
      KeyedEvent(1L, 61_000_000L, 20.0), KeyedEvent(1L, 90_000_000L, 8.0),
      KeyedEvent(1L, 121_000_000L, 9.0), KeyedEvent(1L, 150_000_000L, 9.5),
      KeyedEvent(2L, 5_000_000L, 5.0), KeyedEvent(2L, 65_000_000L, 15.0),
      KeyedEvent(2L, 125_000_000L, 4.0))
    val out = StreamingOps.candleStrat(streamOf(events).toDS(), 60_000_000L)
    runToTable(out.toDF(), "t_strat", OutputMode.Append())
    val got = spark.table("t_strat")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // batch ground truth: tumbling candles + lag classify, minus each
    // key's LAST candle (streaming only classifies closed candles —
    // the reference's single-pass emission semantics, SURVEY §3)
    import org.apache.spark.sql.expressions.Window
    val bdf = events.toDF()
    val candles = bdf.groupBy((col("tsUs") / 60_000_000L).cast("long").as("w"), col("key"))
      .agg(min_by(col("value"), col("tsUs")).as("open"), max_by(col("value"), col("tsUs")).as("close"),
        max(col("tsUs")).as("maxTs"))
      .withColumn("wsUs", col("w") * 60_000_000L)
    val w = Window.partitionBy("key").orderBy("wsUs")
    val lastWs = candles.groupBy("key").agg(max("wsUs").as("lastWs"))
    val expect = candles
      .withColumn("top", greatest(col("open"), col("close")))
      .withColumn("bottom", least(col("open"), col("close")))
      .withColumn("ptop", lag(greatest(col("open"), col("close")), 1).over(w))
      .withColumn("pbottom", lag(least(col("open"), col("close")), 1).over(w))
      .filter(col("ptop").isNotNull)
      .join(lastWs, "key").filter(col("wsUs") =!= col("lastWs"))
      .select(col("key"), col("wsUs"),
        when(col("top") > col("ptop") && col("bottom") < col("pbottom"), 4)
          .when(col("top") > col("ptop"), 2)
          .when(col("bottom") < col("pbottom"), 3).otherwise(1).as("cls"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("streaming seqNumbers derive throttle/skipTake/chunk matching batch operators") {
    import spark.implicits._
    val events = mkEvents
    val out = StreamingOps.seqNumbers(streamOf(events).toDS())
    runToTable(out.toDF(), "t_seq", OutputMode.Append())
    val seq = spark.table("t_seq")

    val bdf = events.toDF().withColumn("ts", timestamp_micros(col("tsUs")))

    // throttle(2)
    val gotThrottle = seq.filter(col("seq") % 2 === 1).select("key", "tsUs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expThrottle = Keyed.throttle(bdf, Seq("key"), Seq("tsUs"), every = 2)
      .select("key", "tsUs").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotThrottle == expThrottle)

    // skip(1).take(2)
    val gotSkip = seq.filter(col("seq") > 1 && col("seq") <= 3).select("key", "tsUs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expSkip = Keyed.skipTake(bdf, Seq("key"), Seq("tsUs"), skip = 1, take = 2)
      .select("key", "tsUs").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSkip == expSkip)

    // chunk(2)
    val gotChunk = seq.withColumn("chunk_id", ((col("seq") - 1) / 2).cast("long"))
      .select("key", "tsUs", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expChunk = Keyed.chunk(bdf, Seq("key"), Seq("tsUs"), 2)
      .select("key", "tsUs", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotChunk == expChunk)
  }

  test("streaming sessionize matches batch sessionize for every micro-batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 30 s gap splits mkEvents' key-1 times into real sessions:
    // 1M | 61M, 62M | 200M; key 2 into 5M | 65M
    val gapUs = 30_000_000L
    val events = mkEvents
    val bdf = events.toDF()
    val expect = Keyed.sessionize(bdf, Seq("key"), "tsUs", Seq("tsUs", "value"), gapUs)
      .select("key", "tsUs", "session_idx", "pos_in_session")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // three different batchings of the SAME in-order stream
    val splits = Seq(Seq(events), events.grouped(2).toSeq, events.map(Seq(_)))
    for ((batches, i) <- splits.zipWithIndex) {
      val ms = MemoryStream[KeyedEvent]
      val q = StreamingOps.sessionize(ms.toDS(), gapUs).toDF()
        .writeStream.format("memory").queryName(s"t_sess_$i")
        .outputMode(OutputMode.Append()).start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      val got = spark.table(s"t_sess_$i")
        .select("key", "tsUs", "sessionIdx", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expect, s"batching $i diverged")
      assert(got.nonEmpty && got.exists(_._3 >= 2L), "expected at least two sessions per some key")
    }
  }

  test("stream-stream interval join evicts state past the watermark (late right dropped)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val msL = MemoryStream[KeyedEvent]
    val msR = MemoryStream[KeyedEvent]
    val ls = msL.toDF().select(col("key").as("lk"),
      timestamp_micros(col("tsUs")).as("lts"), col("tsUs").as("ltus"))
    val rs = msR.toDF().select(col("key").as("rk"),
      timestamp_micros(col("tsUs")).as("rts"), col("tsUs").as("rtus"))
    val j = StreamingOps.intervalJoin(ls, rs, "lk", "rk", "lts", "rts", "1 MINUTE", "10 seconds")
    val q = j.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("t_ivj_late").start()
    try {
      // batch 1: (1s ⋈ 2s) matches; 500s rows advance both watermarks
      msL.addData(Seq(KeyedEvent(1L, 1_000_000L, 1.0), KeyedEvent(1L, 500_000_000L, 1.0)))
      msR.addData(Seq(KeyedEvent(1L, 2_000_000L, 1.0), KeyedEvent(1L, 500_000_000L, 1.0)))
      q.processAllAvailable()
      // batch 2: a right event at 30s would match left 1s, but both the
      // event and the left state are far below the watermark → dropped
      msR.addData(Seq(KeyedEvent(1L, 30_000_000L, 9.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_ivj_late").select("ltus", "rtus")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1_000_000L, 2_000_000L)) && got.contains((500_000_000L, 500_000_000L)), got)
    assert(!got.contains((1_000_000L, 30_000_000L)),
      s"late right event joined against evicted state: $got")
  }

  test("streaming runningFold matches the batch cumulative window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val events = mkEvents
    val out = StreamingOps.runningFold(streamOf(events).toDS())
    runToTable(out.toDF(), "t_runfold", OutputMode.Append())
    val got = spark.table("t_runfold").select("key", "tsUs", "seq", "runCents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val w = Window.partitionBy("key").orderBy("tsUs", "value")
    val expect = events.toDF()
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("runCents",
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select("key", "tsUs", "seq", "runCents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("streaming interArrival matches the batch lag gap, across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    implicit val sqlCtx = spark.sqlContext
    val all = mkEvents
    val (b1, b2) = all.splitAt(3) // state must carry the gap across the batch boundary
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.interArrival(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("t_gap").outputMode(OutputMode.Append()).start()
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val got = spark.table("t_gap").select("key", "tsUs", "gapUs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val w = Window.partitionBy("key").orderBy("tsUs", "value")
    val expect = all.toDF()
      .withColumn("gapUs", coalesce(col("tsUs") - lag(col("tsUs"), 1).over(w), lit(-1L)))
      .select("key", "tsUs", "gapUs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.exists(_._3 == -1L) && got.exists(_._3 > 0L))
  }

  test("streaming ewma matches the exact integer fold, state carries across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = mkEvents
    val (b1, b2) = all.splitAt(3) // smoothed value must survive the batch boundary
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.ewma(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("t_ewma").outputMode(OutputMode.Append()).start()
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val got = spark.table("t_ewma").select("key", "tsUs", "ewmaCents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // reference fold, driver-side, in the same exact integer arithmetic
    val expect = all.groupBy(_.key).toSeq.flatMap { case (k, es) =>
      var acc = -1L
      es.sortBy(e => (e.tsUs, e.value)).map { e =>
        val cents = (BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
        acc = if (acc < 0L) cents else (300L * cents + 700L * acc) / 1000L
        (k, e.tsUs, acc)
      }
    }.toSet
    assert(got == expect)
    // the recurrence actually smoothed something (not just echoing v_i)
    assert(got.map(_._3) != all.map(e =>
      (BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).toSet)
  }

  test("streaming cusum matches the literal recurrence; alarm fires exactly at threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = mkEvents
    val (b1, b2) = all.splitAt(3)
    val target = 1200L // cents; tape values 5–40 → drifts both ways
    val thresh = 1500L
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.cusum(ms.toDS(), target, thresh).toDF()
      .writeStream.format("memory").queryName("t_cusum").outputMode(OutputMode.Append()).start()
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val got = spark.table("t_cusum").select("key", "tsUs", "cusumCents", "alarmed")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet

    val expect = all.groupBy(_.key).toSeq.flatMap { case (k, es) =>
      var s = 0L
      es.sortBy(e => (e.tsUs, e.value)).map { e =>
        val cents = (BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
        s = math.max(0L, s + (cents - target))
        (k, e.tsUs, s, s >= thresh)
      }
    }.toSet
    assert(got == expect)
    assert(got.exists(_._4) && got.exists(!_._4), got) // both alarm states exercised
  }

  test("streaming time-based throttle rate-limits per key, state carries across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 60s interval over mkEvents: key 1 emits at 1s (first), 61s
    // (gap 60s), drops 62s (gap 1s from last EMIT), emits 200s; key 2
    // emits at 5s and 65s. The batch split lands between 62s and 200s
    // so the last-emit timestamp must survive the boundary.
    val all = mkEvents
    val (b1, b2) = all.splitAt(3)
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.throttleTime(ms.toDS(), 60_000_000L).toDF()
      .writeStream.format("memory").queryName("t_throttle")
      .outputMode(OutputMode.Append()).start()
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val got = spark.table("t_throttle").select("key", "tsUs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // greedy emit-then-arm ground truth, walked per key in event order
    val expect = all.groupBy(_.key).toSeq.flatMap { case (k, evs) =>
      var lastEmit = Long.MinValue
      evs.sortBy(e => (e.tsUs, e.value)).flatMap { e =>
        if (lastEmit == Long.MinValue || e.tsUs - lastEmit >= 60_000_000L) {
          lastEmit = e.tsUs; Some((k, e.tsUs))
        } else None
      }
    }.toSet
    assert(got == expect)
    assert(got == Set((1L, 1_000_000L), (1L, 61_000_000L), (1L, 200_000_000L),
      (2L, 5_000_000L), (2L, 65_000_000L)))
  }

  test("streaming heavyHitters keeps both Misra-Gries bounds across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val b1 = (1 to 60).map(i => ("g1", if (i % 3 == 0) "hot" else s"t$i")) ++
      (1 to 30).map(_ => ("g2", "dominant"))
    val b2 = (1 to 60).map(i => ("g1", if (i % 2 == 0) "hot" else s"u$i")) ++
      (1 to 10).map(i => ("g2", s"rare$i"))
    val ms = MemoryStream[(String, String)]
    val q = StreamingOps.heavyHitters(ms.toDS(), k).toDF()
      .writeStream.format("memory").queryName("t_hh").outputMode(OutputMode.Update()).start()
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_hh").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // the sketch re-emits per batch; judge the LATEST emission per group
    val latest = rows.groupBy(_._1).map { case (g, rs) =>
      val mx = rs.map(_._4).max; g -> rs.filter(_._4 == mx)
    }
    val all = b1 ++ b2
    val exact = all.groupBy(identity).map { case (gt, xs) => gt -> xs.size.toLong }
    val nPer = all.groupBy(_._1).map { case (g, xs) => g -> xs.size.toLong }
    for ((gt @ (g, t), c) <- exact if c > nPer(g) / k)
      assert(latest(g).exists(_._2 == t), s"frequent ($g, $t) freq=$c missing from sketch")
    for ((g, rs) <- latest; (_, t, est, _) <- rs) {
      val truth = exact((g, t))
      assert(est <= truth, s"($g, $t): est=$est overcounts true=$truth")
      assert(truth - est <= nPer(g) / k, s"($g, $t): undercount ${truth - est} > ${nPer(g) / k}")
    }
    assert(latest.values.forall(_.nonEmpty))
  }

  test("streaming cmsFreq equals the batch Count-Min sketch EXACTLY, for any batching") {
    // CM merge is elementwise sum — associative + commutative — so the
    // streaming estimates must EQUAL the batch aggregator's on the same
    // data regardless of micro-batch boundaries (not just bounds-close)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val depth = 4; val width = 64
    val probes = Seq("hot", "dominant", "absent", "t5")
    val all = ((1 to 60).map(i => ("g1", if (i % 3 == 0) "hot" else s"t$i")) ++
      (1 to 30).map(_ => ("g2", "dominant"))).toIndexedSeq
    // batch ground truth straight from the shared kernel
    val cm = new graft.functions.CountMin(depth, width)
    val expected = all.groupBy(_._1).flatMap { case (g, xs) =>
      val sk = xs.foldLeft(cm.zero) { case (b, (_, t)) => cm.reduce(b, t) }
      probes.map(t => (g, t) -> cm.estimate(sk, t))
    }
    def run(batches: Seq[Seq[(String, String)]]): Map[(String, String), Long] = {
      val ms = MemoryStream[(String, String)]
      val name = s"t_cms_${batches.size}"
      val q = StreamingOps.cmsFreq(ms.toDS(), depth, width, probes).toDF()
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Update()).start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        val rows = spark.table(name).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        rows.groupBy(r => (r._1, r._2)).map { case (k, rs) => k -> rs.maxBy(_._4)._3 }
      } finally q.stop()
    }
    assert(run(Seq(all)) == expected, "single batch")
    assert(run(all.grouped(25).map(_.toSeq).toSeq) == expected, "four batches")
  }

  test("streaming weightedSampleIncremental equals the batch weighted sample, for any batching") {
    // priorities are a pure function of (id, weight) and top-k over
    // distinct ids is order-independent, so the parity is EXACT
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextFns
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("doc_id"),
        greatest(size(TextFns.tokensFast(col("text"))).cast("long"), lit(1L)).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    val expected = Queries.queries("q_weighted_sample")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    def run(batches: Seq[Seq[(String, Long, Long)]]): Set[(String, Long, Long, Long, Long)] = {
      val ms = MemoryStream[(String, Long, Long)]
      val name = s"t_wsamp_${batches.size}"
      val q = StreamingOps.weightedSampleIncremental(ms.toDS(), 5).toDF()
        .writeStream.format("memory").queryName(name).outputMode(OutputMode.Update()).start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        // latest emission per (group, id): the final sample is the last
        // batch's emission per group — pick rows from the max-rank-set
        // emission by taking each group's LAST emitted batch; memory
        // sink appends, so dedupe to the final state via groupBy rank
        // ordering: take the last occurrence per (group, rank)
        val all = spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        all.zipWithIndex.groupBy { case (t, _) => (t._1, t._5) }
          .map { case (_, xs) => xs.maxBy(_._2)._1 }.toSet
      } finally q.stop()
    }
    assert(run(Seq(rows.toSeq)) == expected, "single batch")
    assert(run(rows.grouped(150).map(_.toSeq).toSeq) == expected, "multiple batches")
  }

  test("streaming lastTouch matches the batch as-of attribution, across micro-batches") {
    import spark.implicits._
    import graft.streaming.StreamingOps.TouchEvent
    implicit val sqlCtx = spark.sqlContext
    val winUs = 60_000_000L // 1 minute
    val all = Seq(
      TouchEvent(1L, 1_000_000L, isTouch = true),   // click
      TouchEvent(1L, 2_000_000L, isTouch = false),  // purchase 1s later → attributed
      TouchEvent(1L, 100_000_000L, isTouch = false), // 99s after click → outside window
      TouchEvent(2L, 5_000_000L, isTouch = false),  // no click ever → unattributed
      TouchEvent(2L, 6_000_000L, isTouch = true),
      TouchEvent(2L, 6_000_000L + 30_000_000L, isTouch = false), // 30s → attributed (state from batch 1)
      TouchEvent(1L, 200_000_000L, isTouch = true),
      TouchEvent(1L, 200_000_000L, isTouch = false)) // same-ts touch attributes (<= semantics)
    val (b1, b2) = all.splitAt(5)
    val ms = MemoryStream[TouchEvent]
    val q = StreamingOps.lastTouch(ms.toDS(), winUs).toDF()
      .writeStream.format("memory").queryName("t_attr").outputMode(OutputMode.Append()).start()
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val got = spark.table("t_attr").select("key", "tsUs", "attributed")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

    val purchases = all.filter(!_.isTouch).toDF()
      .select(col("key"), col("tsUs").as("p_us"), monotonically_increasing_id().as("pid"))
    val clicks = all.filter(_.isTouch).toDF()
      .select(col("key").as("c_key"), col("tsUs").as("c_us"), lit(0L).as("c_ord"))
    val expect = Joins.asofJoin(purchases, clicks, "key", "c_key", "p_us", "c_us", "c_ord", Seq("c_us"))
      .select(col("key"), col("p_us"),
        (col("c_us").isNotNull && col("p_us") - col("c_us") <= winUs).as("attributed"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expect)
    assert(got.count(_._3) == 3 && got.size == 5)
  }

  test("streaming dedupExact matches batch first-occurrence dedup") {
    import spark.implicits._
    // dedup key = value (stands in for a content hash); dups across keys
    val events = Seq(
      KeyedEvent(1L, 1_000_000L, 10.0), KeyedEvent(2L, 2_000_000L, 10.0),
      KeyedEvent(3L, 3_000_000L, 20.0), KeyedEvent(4L, 4_000_000L, 10.0),
      KeyedEvent(5L, 5_000_000L, 20.0), KeyedEvent(6L, 6_000_000L, 30.0))
    val sdf = streamOf(events).toDF().withColumn("ts", timestamp_micros(col("tsUs")))
    val out = StreamingOps.dedupExact(sdf, "ts", Seq("value"), "10 seconds")
    runToTable(out.drop("ts"), "t_dedup", OutputMode.Append())
    val got = spark.table("t_dedup").select("key", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    // batch ground truth: first occurrence (min event time) per value
    val expect = events.toDF().groupBy("value")
      .agg(min_by(col("key"), col("tsUs")).as("key"))
      .select("key", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == expect)
  }

  test("stateful table survives a query restart from checkpoint (RocksDB recovery)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val ms = MemoryStream[KeyedEvent]
    // memory sink cannot recover from a checkpoint; foreachBatch can
    def start() = StreamingOps.tableLatest(ms.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$tmp/out/batch_id=$batchId")
      }
      .option("checkpointLocation", s"$tmp/ckpt").start()

    // first query: key 1 latest = (61s, 20.0)
    ms.addData(Seq(KeyedEvent(1L, 1_000_000L, 10.0), KeyedEvent(1L, 61_000_000L, 20.0)))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // second query from the SAME checkpoint: an OLDER event for key 1
    // must lose against the recovered state, not against empty state
    ms.addData(Seq(KeyedEvent(1L, 30_000_000L, 99.0), KeyedEvent(2L, 5_000_000L, 5.0)))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val latest = spark.read.parquet(s"$tmp/out")
      .groupBy("key").agg(max_by(struct(col("tsUs"), col("value")), col("tsUs")).as("s"))
      .select(col("key"), col("s.tsUs"), col("s.value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(latest == Set((1L, 61_000_000L, 20.0), (2L, 5_000_000L, 5.0)))
  }

  test("runningFold state survives a query restart from checkpoint (sums continue exactly)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-runfold-ckpt").toString
    val ms = MemoryStream[KeyedEvent]
    def start() = StreamingOps.runningFold(ms.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$tmp/out/batch_id=$batchId")
      }
      .option("checkpointLocation", s"$tmp/ckpt").start()

    ms.addData(Seq(KeyedEvent(1L, 1_000_000L, 10.50), KeyedEvent(1L, 2_000_000L, 0.25)))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // restart: the running sum must continue from 1075 cents, seq from 3
    ms.addData(Seq(KeyedEvent(1L, 3_000_000L, 1.00)))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(s"$tmp/out")
      .select("key", "tsUs", "seq", "runCents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(
      (1L, 1_000_000L, 1L, 1050L),
      (1L, 2_000_000L, 2L, 1075L),
      (1L, 3_000_000L, 3L, 1175L)))
  }

  test("ewma state survives a query restart from checkpoint (smoothing continues exactly)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-ewma-ckpt").toString
    val ms = MemoryStream[KeyedEvent]
    def start() = StreamingOps.ewma(ms.toDS()).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$tmp/out/batch_id=$batchId")
      }
      .option("checkpointLocation", s"$tmp/ckpt").start()

    ms.addData(Seq(KeyedEvent(1L, 1_000_000L, 10.00), KeyedEvent(1L, 2_000_000L, 20.00)))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // e0 = 1000; e1 = (300*2000 + 700*1000) div 1000 = 1300; after
    // restart e2 must continue from 1300, not reseed
    ms.addData(Seq(KeyedEvent(1L, 3_000_000L, 30.00)))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(s"$tmp/out")
      .select("key", "tsUs", "ewmaCents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(
      (1L, 1_000_000L, 1000L),
      (1L, 2_000_000L, 1300L),
      (1L, 3_000_000L, (300L * 3000L + 700L * 1300L) / 1000L))) // 1810
  }

  test("lastTouch state survives a query restart from checkpoint (touch carries over)") {
    import spark.implicits._
    import graft.streaming.StreamingOps.TouchEvent
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-touch-ckpt").toString
    val ms = MemoryStream[TouchEvent]
    def start() = StreamingOps.lastTouch(ms.toDS(), 60_000_000L).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$tmp/out/batch_id=$batchId")
      }
      .option("checkpointLocation", s"$tmp/ckpt").start()

    ms.addData(Seq(TouchEvent(1L, 1_000_000L, isTouch = true)))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // restart: the click at 1s must attribute a purchase at 31s
    ms.addData(Seq(TouchEvent(1L, 31_000_000L, isTouch = false)))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(s"$tmp/out")
      .select("key", "tsUs", "touchTsUs", "attributed")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(rows == Set((1L, 31_000_000L, 1_000_000L, true)))
  }

  test("throttleTime state survives a query restart from checkpoint (interval stays armed)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-throttle-ckpt").toString
    val ms = MemoryStream[KeyedEvent]
    def start() = StreamingOps.throttleTime(ms.toDS(), 60_000_000L).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$tmp/out/batch_id=$batchId")
      }
      .option("checkpointLocation", s"$tmp/ckpt").start()

    // first event emits and arms the 60s interval
    ms.addData(Seq(KeyedEvent(1L, 1_000_000L, 10.0)))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // restart: 30s arrival must still be inside the armed interval
    // (drop); 61s must pass
    ms.addData(Seq(KeyedEvent(1L, 31_000_000L, 20.0), KeyedEvent(1L, 61_000_000L, 30.0)))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(s"$tmp/out").select("key", "tsUs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 1_000_000L), (1L, 61_000_000L)))
  }

  test("incremental span coverage: one batch equals q_span_scrub; later copies flag against history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // single-batch run over the real corpus == the batch query, row for row
    val tmp1 = java.nio.file.Files.createTempDirectory("graft-ispan1").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ms1 = MemoryStream[(Long, String)]
    val q1 = StreamingOps.spanScrubIncremental(
        ms1.toDF().toDF("doc_id", "text"), "doc_id", "text",
        s"$tmp1/history", s"$tmp1/out")
      .option("checkpointLocation", s"$tmp1/ckpt").start()
    try { ms1.addData(docs); q1.processAllAvailable() } finally q1.stop()
    val got = spark.read.parquet(s"$tmp1/out")
      .select("doc_id", "n_tokens", "dup_tokens", "keep_milli")
      .collect().map(_.toString).sorted.toSeq
    val batchRows = Queries.queries("q_span_scrub")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(got == batchRows && got.nonEmpty)

    // prefix semantics across batches: an exact copy arriving LATER is
    // fully covered; the original (batch 1) stays untouched
    val tmp2 = java.nio.file.Files.createTempDirectory("graft-ispan2").toString
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val ms2 = MemoryStream[(Long, String)]
    def start2() = StreamingOps.spanScrubIncremental(
        ms2.toDF().toDF("doc_id", "text"), "doc_id", "text",
        s"$tmp2/history", s"$tmp2/out")
      .option("checkpointLocation", s"$tmp2/ckpt").start()
    val qa = start2()
    try { ms2.addData(Seq((1L, a))); qa.processAllAvailable() } finally qa.stop()
    val qb = start2()
    try { ms2.addData(Seq((2L, a))); qb.processAllAvailable() } finally qb.stop()
    val rows = spark.read.parquet(s"$tmp2/out")
      .select("doc_id", "n_tokens", "dup_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows == Map(1L -> ((20L, 0L)), 2L -> ((20L, 20L))), rows)
  }

  test("incremental minhash dedup drops near-dups within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-iminhash").toString
    val ms = MemoryStream[(Long, String)]
    val writer = StreamingOps.dedupMinhashIncremental(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$tmp/history", s"$tmp/survivors")
    val q = writer.option("checkpointLocation", s"$tmp/ckpt").start()
    try {
      val textA = "alpha beta gamma delta epsilon zeta eta theta"
      val textB = "one two three four five six seven eight nine"
      // batch 1: 1 and its exact dup 2 → only 1 survives
      ms.addData((1L, textA), (2L, textA))
      q.processAllAvailable()
      // batch 2: 3 dups history doc 1 → dropped; 4 is new → survives
      ms.addData((3L, textA), (4L, textB))
      q.processAllAvailable()
      val survivors = spark.read.parquet(s"$tmp/survivors")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(survivors == Set(1L, 4L))
    } finally q.stop()
  }

  test("incremental minhash dedup keep-set is invariant to micro-batch boundaries") {
    // band chain A~B~C (B shares a band with A and with C; A shares
    // none with C): the batch rule drops B (by A) AND C (by B, even
    // though B was itself dropped) → survivors {A}. A survivors-only
    // history would re-admit C when the boundary falls between B and
    // C — this test pins the all-seen-history semantics.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val textC = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    val textB = s"$textA $textC" // per-slot min(A, C): bands from both sides
    // precondition: the three texts really form the A~B~C band chain
    // (disjoint vocabularies make A~C collisions all but impossible,
    // but assert all three relations so a kernel change fails loudly)
    val bands = Seq(1L -> textA, 2L -> textB, 3L -> textC).toDF("id", "text")
      .select(col("id"), posexplode(graft.functions.DedupFns.minhashBandsFast(
        graft.functions.TextFns.tokensFast(col("text")), 3)).as(Seq("band", "bh")))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._2).toSet }
    assert((bands(1L) & bands(2L)).nonEmpty, "A~B band collision (precondition)")
    assert((bands(2L) & bands(3L)).nonEmpty, "B~C band collision (precondition)")
    assert((bands(1L) & bands(3L)).isEmpty, "A and C share no band (precondition)")
    def run(batches: Seq[Seq[(Long, String)]]): Set[Long] = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-imhsplit").toString
      val ms = MemoryStream[(Long, String)]
      val q = StreamingOps.dedupMinhashIncremental(
          ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
          s"$tmp/history", s"$tmp/survivors")
        .option("checkpointLocation", s"$tmp/ckpt").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.read.parquet(s"$tmp/survivors")
          .select("id").collect().map(_.getLong(0)).toSet
      } finally q.stop()
    }
    val data = Seq(1L -> textA, 2L -> textB, 3L -> textC)
    assert(run(Seq(data)) == Set(1L), "single batch")
    assert(run(Seq(data.take(2), data.drop(2))) == Set(1L), "split between B and C")
    assert(run(data.map(Seq(_))) == Set(1L), "one doc per batch")
  }

  test("incremental dedup drops an at-least-once RE-DELIVERY of the same doc in a later batch") {
    // same id arriving again in a LATER batch (re-uploaded ingest file)
    // must collide with its OWN history rows — the batch_id replay
    // filter only covers same-batch replays, so a strict smaller-id
    // guard would emit the doc twice from a dedup operator
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // minhash path
    val tmp1 = java.nio.file.Files.createTempDirectory("graft-redeliver-mh").toString
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val ms1 = MemoryStream[(Long, String)]
    val q1 = StreamingOps.dedupMinhashIncremental(
        ms1.toDF().toDF("doc_id", "text"), "doc_id", "text",
        s"$tmp1/history", s"$tmp1/survivors")
      .option("checkpointLocation", s"$tmp1/ckpt").start()
    try {
      ms1.addData(Seq(7L -> text)); q1.processAllAvailable()
      ms1.addData(Seq(7L -> text)); q1.processAllAvailable()
      val rows = spark.read.parquet(s"$tmp1/survivors").select("id").collect().map(_.getLong(0))
      assert(rows.toSeq == Seq(7L), s"re-delivered doc emitted ${rows.length} times")
    } finally q1.stop()
    // semantic path
    val tmp2 = java.nio.file.Files.createTempDirectory("graft-redeliver-sd").toString
    val cents = Seq(Seq(1000L, 0L, 0L, 0L), Seq(0L, 1000L, 0L, 0L))
    val v = Array(1.0f, 0.05f, 0f, 0f)
    val ms2 = MemoryStream[(Long, Array[Float])]
    val q2 = StreamingOps.semDedupIncremental(
        ms2.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        cents, tauNum = 9, tauDen = 10, s"$tmp2/history", s"$tmp2/survivors")
      .option("checkpointLocation", s"$tmp2/ckpt").start()
    try {
      ms2.addData(Seq(7L -> v)); q2.processAllAvailable()
      ms2.addData(Seq(7L -> v)); q2.processAllAvailable()
      val rows = spark.read.parquet(s"$tmp2/survivors").select("id").collect().map(_.getLong(0))
      assert(rows.toSeq == Seq(7L), s"re-delivered vector emitted ${rows.length} times")
    } finally q2.stop()
  }

  test("incremental semantic dedup drops cosine twins within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-isemdedup").toString
    // two fixed well-separated centroids (offline-trained in production)
    val cents = Seq(Seq(1000L, 0L, 0L, 0L), Seq(0L, 1000L, 0L, 0L))
    val ms = MemoryStream[(Long, Array[Float])]
    val writer = StreamingOps.semDedupIncremental(
      ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, tauNum = 9, tauDen = 10,
      s"$tmp/history", s"$tmp/survivors")
    val q = writer.option("checkpointLocation", s"$tmp/ckpt").start()
    try {
      val a  = Array(1.0f, 0.05f, 0f, 0f)   // cell 0
      val a2 = Array(0.999f, 0.06f, 0f, 0f) // cos(a, a2) ≈ 1 > 0.9
      val b  = Array(0.05f, 1.0f, 0f, 0f)   // cell 1; cos(a, b) ≈ 0.1
      // batch 1: 1 and its near-twin 2 land in cell 0 → only 1 survives
      ms.addData((1L, a), (2L, a2))
      q.processAllAvailable()
      // batch 2: 3 is a twin of history keeper 1 → dropped; 4 is the
      // first vector of cell 1 → survives
      ms.addData((3L, a2), (4L, b))
      q.processAllAvailable()
      val survivors = spark.read.parquet(s"$tmp/survivors")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(survivors == Set(1L, 4L))
      // history carries EVERY seen vector (dropped included), keyed by
      // cell — the exact-drop-rule requirement
      val hist = spark.read.parquet(s"$tmp/history")
        .select("id", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hist == Set((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)))
    } finally q.stop()
  }

  test("incremental semantic dedup keep-set is invariant to micro-batch boundaries") {
    // cosine chain 1–2–3 (cos(1,2) ≥ τ, cos(2,3) ≥ τ, cos(1,3) < τ):
    // the batch rule drops 2 (by 1) AND 3 (by 2, even though 2 was
    // itself dropped) → survivors {1}. A keeper-only history would
    // re-admit 3 when the boundary falls between 2 and 3 — this test
    // pins the all-seen-history semantics that keeps every split equal
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cents = Seq(Seq(1000L, 0L, 0L, 0L), Seq(0L, -1000L, 0L, 0L))
    val v1 = Array(1.0f, 0f, 0f, 0f)           // 0°
    val v2 = Array(0.9397f, 0.342f, 0f, 0f)    // 20°: cos(v1,v2) ≈ 0.94
    val v3 = Array(0.766f, 0.6428f, 0f, 0f)    // 40°: cos(v2,v3) ≈ 0.94, cos(v1,v3) ≈ 0.77
    def run(batches: Seq[Seq[(Long, Array[Float])]]): Set[Long] = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-isplit").toString
      val ms = MemoryStream[(Long, Array[Float])]
      val q = StreamingOps.semDedupIncremental(
          ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
          cents, tauNum = 9, tauDen = 10, s"$tmp/history", s"$tmp/survivors")
        .option("checkpointLocation", s"$tmp/ckpt").start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.read.parquet(s"$tmp/survivors")
          .select("id").collect().map(_.getLong(0)).toSet
      } finally q.stop()
    }
    val data = Seq(1L -> v1, 2L -> v2, 3L -> v3)
    assert(run(Seq(data)) == Set(1L), "single batch")
    assert(run(Seq(data.take(2), data.drop(2))) == Set(1L), "split between 2 and 3")
    assert(run(data.map(Seq(_))) == Set(1L), "one vector per batch")
  }

  test("incremental semantic dedup with auto-sized centroids matches the batch report") {
    // centroids auto-sized from the corpus (sqrt-n rule) and shipped to
    // the stream as the fixed plan literal — per-cell kept counts must
    // equal semDedupReport's on the same corpus, centroids, and tau
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.VectorFns
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 200)
    val k = VectorFns.autoCentroidCount(corpus.count())
    val cents = VectorFns.ivfCentroids(corpus, "vec_id", "embedding", k)
    val batchKept = VectorFns.semDedupReport(corpus, "vec_id", "embedding",
        tauNum = 1, tauDen = 4, kCentroids = k)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val tmp = java.nio.file.Files.createTempDirectory("graft-iautok").toString
    val rows = corpus.select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val ms = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.semDedupIncremental(
        ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        cents, tauNum = 1, tauDen = 4, s"$tmp/history", s"$tmp/survivors")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    try {
      rows.sortBy(_._1).grouped(75).foreach { b => ms.addData(b.toSeq); q.processAllAvailable() }
      val streamKept = spark.read.parquet(s"$tmp/survivors")
        .groupBy("cid").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streamKept == batchKept.filter(_._2 > 0L),
        s"stream kept-per-cell $streamKept != batch $batchKept")
    } finally q.stop()
  }

  test("incremental decontamination matches the batch kill rule and is batching-invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.{DedupFns, TextFns}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 120)
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), explode(
        DedupFns.wordNgramsFast(TextFns.tokensFast(col("text")), 4)).as("g"))
    val probeGrams = grams(docs.filter(col("doc_id") < 3)).select("g").distinct().cache()
    val bloom = DedupFns.gramBloomBytes(probeGrams, "g")
    // batch ground truth: exact >= 2 shared distinct grams -> killed
    val killBatch = grams(docs.filter(col("doc_id") >= 3))
      .join(probeGrams, Seq("g"))
      .groupBy("doc_id").agg(countDistinct(col("g")).as("s"))
      .filter(col("s") >= 2).collect().map(_.getLong(0)).toSet
    val expected = docs.filter(col("doc_id") >= 3)
      .collect().map(_.getLong(0)).toSet -- killBatch
    assert(killBatch.nonEmpty, "probe must contaminate something at this sf")
    val rows = docs.filter(col("doc_id") >= 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def run(groups: Seq[Seq[(Long, String)]]): Set[Long] = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-idecon").toString
      val ms = MemoryStream[(Long, String)]
      val q = StreamingOps.decontamIncremental(
          ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
          probeGrams, bloom, s"$tmp/survivors")
        .option("checkpointLocation", s"$tmp/ckpt").start()
      try {
        groups.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.read.parquet(s"$tmp/survivors").select("id").collect().map(_.getLong(0)).toSet
      } finally q.stop()
    }
    assert(run(Seq(rows.toSeq)) == expected, "single batch")
    assert(run(rows.grouped(40).map(_.toSeq).toSeq) == expected, "three batches")
    // cross-batch at-least-once re-delivery: a surviving doc delivered
    // again in a LATER batch must not appear twice in the output (the
    // verdict is deterministic; the survivors table is the dedup state)
    val tmp = java.nio.file.Files.createTempDirectory("graft-idecon-redeliver").toString
    val ms = MemoryStream[(Long, String)]
    val q = StreamingOps.decontamIncremental(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
        probeGrams, bloom, s"$tmp/survivors")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    try {
      ms.addData(rows.take(40).toSeq); q.processAllAvailable()
      ms.addData(rows.take(10).toSeq); q.processAllAvailable() // re-delivery
      val ids = spark.read.parquet(s"$tmp/survivors").select("id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.distinct.size == ids.size, s"duplicate survivor rows: $ids")
      assert(ids.toSet == rows.take(40).map(_._1).toSet.intersect(expected), ids.toString)
    } finally q.stop()
    probeGrams.unpersist()
  }

  test("streaming chunkDocs matches batch chunking (stateless transform, append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, ("w " * 100).trim), // 100 tokens → chunks at 0/32/64/96
      (2L, "a b c"),           // single short chunk
      (3L, ""))                // empty → no chunks
    val ms = MemoryStream[(Long, String)]
    ms.addData(docs)
    val out = graft.functions.TextFns.chunkDocs(ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
    runToTable(out, "t_chunks", OutputMode.Append())
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val got = canon(spark.table("t_chunks"))
    val expect = canon(graft.functions.TextFns.chunkDocs(docs.toDF("doc_id", "text"), "doc_id", "text"))
    assert(got == expect)
    assert(got.count(_._1 == 1L) == 4 && got.count(_._1 == 2L) == 1 && !got.exists(_._1 == 3L))
  }

  test("streaming cdcChunkDocs matches batch content-defined chunking (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a corpus big enough to contain real anchors (hash % 8 == 0 hits
    // ~1 token in 8), a short doc with likely no anchor, and an empty doc
    val docs = Seq(
      (1L, (1 to 80).map(i => s"tok$i").mkString(" ")),
      (2L, "just three words"),
      (3L, ""))
    val ms = MemoryStream[(Long, String)]
    ms.addData(docs)
    val out = graft.functions.TextFns.cdcChunkDocs(ms.toDF().toDF("doc_id", "text"), "doc_id", "text")
    runToTable(out, "t_cdc_chunks", OutputMode.Append())
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val got = canon(spark.table("t_cdc_chunks"))
    val expect = canon(graft.functions.TextFns.cdcChunkDocs(docs.toDF("doc_id", "text"), "doc_id", "text"))
    assert(got == expect)
    // chunk tokens must tile each doc: per-doc n_tokens sums to doc length
    val perDoc = got.groupBy(_._1).view.mapValues(_.toSeq.map(_._3).sum).toMap
    assert(perDoc(1L) == 80L && perDoc(2L) == 3L && !perDoc.contains(3L))
    assert(got.count(_._1 == 1L) > 1, "80 tokens should contain at least one anchor")
  }

  test("streaming gapFill zero-fills closed hours and matches the batch grid across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hourUs = 3_600_000_000L
    // key 1: hours 0,0,2,5 (gaps at 1,3,4); key 2: hours 0,3 (gaps 1,2)
    val batch1 = Seq(
      KeyedEvent(1L, 10L * 60_000_000L, 1.25), KeyedEvent(1L, 40L * 60_000_000L, 2.00),
      KeyedEvent(2L, 5L * 60_000_000L, 7.50))
    val batch2 = Seq(
      KeyedEvent(1L, 2L * hourUs + 60_000_000L, 3.00),
      KeyedEvent(1L, 5L * hourUs, 4.00),
      KeyedEvent(2L, 3L * hourUs + 30L * 60_000_000L, 1.00))
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.gapFill(ms.toDS()).toDF().writeStream
      .format("memory").queryName("t_gapfill").outputMode(OutputMode.Append()).start()
    try {
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_gapfill")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expect = Set(
      (1L, 0L, 2L, 325L), (1L, 1L, 0L, 0L), (1L, 2L, 1L, 300L),
      (1L, 3L, 0L, 0L), (1L, 4L, 0L, 0L), // hour 5 still filling → not emitted
      (2L, 0L, 1L, 750L), (2L, 1L, 0L, 0L), (2L, 2L, 0L, 0L)) // hour 3 still filling
    assert(got == expect, got)
    // batch parity: the streaming rows are exactly the batch grid minus
    // each key's last (still-filling) hour
    val all = batch1 ++ batch2
    val ev = all.toDF().select(col("key"), (col("tsUs") / hourUs).cast("long").as("h"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val hourly = ev.groupBy("key", "h").agg(count(lit(1)).as("n"), sum("cents").as("sm"))
    val grid = ev.groupBy("key").agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("key"), explode(sequence(col("h0"), col("h1"))).as("h"))
    val batchRows = grid.join(hourly, Seq("key", "h"), "left")
      .select(col("key"), col("h"), coalesce(col("n"), lit(0L)), coalesce(col("sm"), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val lastHours = Set((1L, 5L), (2L, 3L))
    assert(got == batchRows.filterNot(r => lastHours((r._1, r._2))))
  }

  test("watermark-driven gapFill flushes a silent key's hours via event-time timers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hourUs = 3_600_000_000L
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.gapFillWatermarked(ms.toDS()).toDF().writeStream
      .format("memory").queryName("t_gapfill_wm").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: key 1 and key 2 both live in hour 0
      ms.addData(Seq(
        KeyedEvent(1L, 10L * 60_000_000L, 1.25), KeyedEvent(1L, 40L * 60_000_000L, 2.00),
        KeyedEvent(2L, 20L * 60_000_000L, 7.50)))
      q.processAllAvailable()
      // batch 2: only key 2 speaks again (hour 3) — advances the watermark
      ms.addData(Seq(KeyedEvent(2L, 3L * hourUs + 10L * 60_000_000L, 1.00)))
      q.processAllAvailable()
      // batch 3: any event; during it the watermark sits at hour 3, so
      // key 1's timer fires and flushes hours 0..2 with NO key-1 event
      ms.addData(Seq(KeyedEvent(2L, 3L * hourUs + 20L * 60_000_000L, 2.00)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_gapfill_wm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expect = Set(
      (1L, 0L, 2L, 325L), (1L, 1L, 0L, 0L), (1L, 2L, 0L, 0L), // timer-flushed, no key-1 events
      (2L, 0L, 1L, 750L), (2L, 1L, 0L, 0L), (2L, 2L, 0L, 0L)) // closed by key 2's own hour-3 event
    assert(got == expect, got)
  }

  test("chunksTimeout: size-full chunks, event-time expiry, watermark partial flush — split-invariant") {
    // maxSize=3, timeout=60s. key 1's tape exercises every close path:
    //  [1s,2s,3s]   → closes FULL (size 3)
    //  [10s,15s]    → closes PARTIAL when the 100s event passes 10s+60s
    //  [100..102s]  → closes FULL
    //  [200s]       → closes PARTIAL via the EVENT-TIME TIMER once key
    //                 2's 300s event drives the watermark past 260s
    // key 2's own open chunk (deadline 360s > watermark 300s) must NOT flush.
    val events = Seq(
      KeyedEvent(1L, 1_000_000L, 1.0), KeyedEvent(1L, 2_000_000L, 2.0),
      KeyedEvent(1L, 3_000_000L, 3.0), KeyedEvent(1L, 10_000_000L, 4.0),
      KeyedEvent(1L, 15_000_000L, 5.0), KeyedEvent(1L, 100_000_000L, 6.0),
      KeyedEvent(1L, 101_000_000L, 7.0), KeyedEvent(1L, 102_000_000L, 8.0),
      KeyedEvent(1L, 200_000_000L, 9.0),
      KeyedEvent(2L, 300_000_000L, 50.0))
    val expect = Set(
      (1L, 1L, 3, 1_000_000L, 3_000_000L, List(1.0, 2.0, 3.0)),
      (1L, 2L, 2, 10_000_000L, 15_000_000L, List(4.0, 5.0)),
      (1L, 3L, 3, 100_000_000L, 102_000_000L, List(6.0, 7.0, 8.0)),
      (1L, 4L, 1, 200_000_000L, 200_000_000L, List(9.0)))

    def run(name: String)(feed: (org.apache.spark.sql.execution.streaming.runtime.MemoryStream[KeyedEvent],
        org.apache.spark.sql.streaming.StreamingQuery) => Unit): Set[(Long, Long, Int, Long, Long, List[Double])] = {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[KeyedEvent]
      val q = StreamingOps.chunksTimeout(ms.toDS(), 3, 60_000_000L).toDF().writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try feed(ms, q) finally q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getSeq[Double](5).toList)).toSet
    }
    // one batch: all size/expiry closes happen inline, the tail partial
    // flushes in the no-data batch the advanced watermark triggers
    val oneShot = run("t_chunks_one") { (ms, q) =>
      ms.addData(events); q.processAllAvailable()
    }
    assert(oneShot == expect, oneShot)
    // the SAME tape split mid-chunk across micro-batches: identical output
    val split = run("t_chunks_split") { (ms, q) =>
      ms.addData(events.take(4)); q.processAllAvailable()
      ms.addData(events.slice(4, 7)); q.processAllAvailable()
      ms.addData(events.drop(7)); q.processAllAvailable()
    }
    assert(split == expect, split)
  }

  test("chunksTimeout matches an independent batch walk on a random tape, for any batching") {
    // second-granularity timestamps keep the µs→ms timer arithmetic
    // away from rounding edges; the walk mirrors the operator's rules
    // exactly: close on size, close on strict event-time expiry before
    // consuming, final partial flushes only if the tape's watermark
    // STRICTLY passed its deadline
    val rnd = new scala.util.Random(11)
    val tape = (1 to 60).map { _ =>
      KeyedEvent(1L + rnd.nextInt(3), (1L + rnd.nextInt(600)) * 1_000_000L, rnd.nextInt(100).toDouble)
    }.distinct
    val maxSize = 4
    val timeoutUs = 90_000_000L
    // walk parameterized by the tape's final watermark: with delay d,
    // wm = max event time − d, and only partials whose deadline the
    // watermark STRICTLY passed flush at the end
    def walk(wmUs: Long): Set[(Long, Long, Int, Long, Long, List[Double])] = tape.groupBy(_.key).flatMap {
      case (k, evs) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Long, Long, List[Double])]
        var (cid, first, last) = (1L, 0L, 0L)
        var buf = List.empty[Double]
        def flush(): Unit = if (buf.nonEmpty) {
          out += ((k, cid, buf.size, first, last, buf.reverse)); cid += 1; buf = Nil
        }
        evs.sortBy(e => (e.tsUs, e.value)).foreach { e =>
          if (buf.nonEmpty && e.tsUs > first + timeoutUs) flush()
          if (buf.isEmpty) first = e.tsUs
          last = e.tsUs; buf = e.value :: buf
          if (buf.size >= maxSize) flush()
        }
        if (buf.nonEmpty && wmUs / 1000L > first / 1000L + timeoutUs / 1000L) flush()
        out
    }.toSet
    val maxTs = tape.map(_.tsUs).max

    def run(name: String, batches: Seq[Seq[KeyedEvent]],
        delay: String = "0 seconds"): Set[(Long, Long, Int, Long, Long, List[Double])] = {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[KeyedEvent]
      val q = StreamingOps.chunksTimeout(ms.toDS(), maxSize, timeoutUs, delay).toDF().writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() } finally q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getSeq[Double](5).toList)).toSet
    }
    // one shot — but feed the tape time-sorted: watermark semantics
    // assume an in-order stream ACROSS batches, and random batch cuts
    // of a sorted tape exercise every mid-chunk boundary
    val sorted = tape.sortBy(e => (e.tsUs, e.value))
    val expect = walk(maxTs)
    assert(run("t_ct_rand1", Seq(sorted)) == expect)
    val cut1 = 1 + rnd.nextInt(sorted.size - 2)
    val cut2 = cut1 + 1 + rnd.nextInt(sorted.size - cut1 - 1)
    val three = Seq(sorted.take(cut1), sorted.slice(cut1, cut2), sorted.drop(cut2))
    assert(run("t_ct_rand3", three) == expect)
    // a 30s watermark delay holds back exactly the tail partials whose
    // deadline the delayed watermark no longer passes
    assert(run("t_ct_rand_delay", Seq(sorted), "30 seconds") == walk(maxTs - 30_000_000L))
  }

  test("timeoutMonitor: one stall per silence via timer OR closing event — split-invariant") {
    // timeout 60s. key 1 goes silent twice mid-tape and once at the end;
    // key 2's single silence closes by its own event; key 3 exists to
    // drive the watermark between key 1's events so the TIMER path (not
    // just the closing-event path) raises alarms under split feeding.
    val events = Seq(
      KeyedEvent(1L, 1_000_000L, 1.0), KeyedEvent(1L, 2_000_000L, 2.0),
      KeyedEvent(2L, 5_000_000L, 3.0),
      KeyedEvent(3L, 150_000_000L, 4.0),
      KeyedEvent(1L, 200_000_000L, 5.0),
      KeyedEvent(2L, 300_000_000L, 6.0))
    // key 1: 2s→200s silence; trailing 200s+60s=260s < wm 300s
    // key 2: 5s→300s silence; trailing 360s > wm 300s → stays open
    // key 3: trailing 210s < wm 300s
    val expect = Set(
      (1L, 2_000_000L, 62_000_000L), (1L, 200_000_000L, 260_000_000L),
      (2L, 5_000_000L, 65_000_000L), (3L, 150_000_000L, 210_000_000L))

    def run(name: String, batches: Seq[Seq[KeyedEvent]]): Set[(Long, Long, Long)] = {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[KeyedEvent]
      val q = StreamingOps.timeoutMonitor(ms.toDS(), 60_000_000L).toDF().writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() } finally q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    // one batch: every mid-tape silence closes via the EVENT path, tails
    // via the no-data batch after the watermark lands at 300s
    assert(run("t_stall_one", Seq(events)) == expect)
    // split so key 3's 150s event advances the watermark past key 1's
    // 62s deadline BEFORE key 1's 200s event arrives: the timer raises
    // the alarm first, and the later event must NOT duplicate it
    val split = Seq(events.take(3), Seq(events(3)), Seq(events(4)), Seq(events(5)))
    assert(run("t_stall_split", split) == expect)
  }

  test("timeoutMonitor matches an independent batch walk on a random tape, for any batching") {
    // second-granularity timestamps keep µs→ms timer arithmetic away
    // from rounding edges (chunksTimeout's discipline); the walk is the
    // operator's spec: one stall per consecutive-pair gap > timeout,
    // plus a trailing stall when the tape's final watermark strictly
    // passed lastSeen + timeout
    val rnd = new scala.util.Random(47)
    val tape = (1 to 70).map { _ =>
      KeyedEvent(1L + rnd.nextInt(4), (1L + rnd.nextInt(900)) * 1_000_000L, rnd.nextInt(100).toDouble)
    }.distinct
    val timeoutUs = 120_000_000L
    def walk(wmUs: Long): Set[(Long, Long, Long)] = tape.groupBy(_.key).flatMap {
      case (k, evs) =>
        val ts = evs.map(_.tsUs).distinct.sorted
        val mid = ts.zip(ts.tail).collect {
          case (a, b) if b - a > timeoutUs => (k, a, a + timeoutUs)
        }
        val tail = if (wmUs / 1000L > (ts.last + timeoutUs) / 1000L)
          Seq((k, ts.last, ts.last + timeoutUs)) else Nil
        mid ++ tail
    }.toSet
    val sorted = tape.sortBy(e => (e.tsUs, e.value))
    val maxTs = tape.map(_.tsUs).max

    def run(name: String, batches: Seq[Seq[KeyedEvent]],
        delay: String = "0 seconds"): Set[(Long, Long, Long)] = {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[KeyedEvent]
      val q = StreamingOps.timeoutMonitor(ms.toDS(), timeoutUs, delay).toDF().writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() } finally q.stop()
      spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val expect = walk(maxTs)
    assert(expect.nonEmpty, "tape failed to produce any silence period")
    assert(run("t_stall_rand1", Seq(sorted)) == expect)
    val cut1 = 1 + rnd.nextInt(sorted.size - 2)
    val cut2 = cut1 + 1 + rnd.nextInt(sorted.size - cut1 - 1)
    assert(run("t_stall_rand3",
      Seq(sorted.take(cut1), sorted.slice(cut1, cut2), sorted.drop(cut2))) == expect)
    // a 60s watermark delay holds back exactly the tail stalls whose
    // deadline the delayed watermark no longer passes
    assert(run("t_stall_rand_delay", Seq(sorted), "60 seconds") == walk(maxTs - 60_000_000L))
  }

  test("ewma + cusum are batching-invariant on a random tape (any micro-batch cuts)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // exact-long state means ANY cut of an in-order tape folds to the
    // same values — the property the recurrences were integerized for
    val rnd = new scala.util.Random(23)
    val tape = (1 to 80).map { i =>
      KeyedEvent(1L + rnd.nextInt(4), i * 1_000_000L, (rnd.nextInt(5000) + 1) / 100.0 * 1.0)
    }
    val sorted = tape.sortBy(e => (e.tsUs, e.value))
    def cuts(): Seq[Seq[KeyedEvent]] = {
      val c1 = 1 + rnd.nextInt(sorted.size - 2)
      val c2 = c1 + 1 + rnd.nextInt(sorted.size - c1 - 1)
      Seq(sorted.take(c1), sorted.slice(c1, c2), sorted.drop(c2))
    }
    def run(name: String, mk: org.apache.spark.sql.Dataset[KeyedEvent] => org.apache.spark.sql.DataFrame,
        batches: Seq[Seq[KeyedEvent]]): Set[String] = {
      val ms = MemoryStream[KeyedEvent]
      val q = mk(ms.toDS()).writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() } finally q.stop()
      spark.table(name).collect().map(_.toString).toSet
    }
    val e1 = run("t_ewma_b1", ds => StreamingOps.ewma(ds).toDF(), Seq(sorted))
    val e2 = run("t_ewma_b3", ds => StreamingOps.ewma(ds).toDF(), cuts())
    val e3 = run("t_ewma_b3b", ds => StreamingOps.ewma(ds).toDF(), cuts())
    assert(e1 == e2 && e1 == e3 && e1.nonEmpty)
    val c1 = run("t_cusum_b1", ds => StreamingOps.cusum(ds, 2500L, 4000L).toDF(), Seq(sorted))
    val c2 = run("t_cusum_b3", ds => StreamingOps.cusum(ds, 2500L, 4000L).toDF(), cuts())
    assert(c1 == c2 && c1.nonEmpty)
    val t1 = run("t_trend_b1", ds => StreamingOps.trendSlope(ds).toDF(), Seq(sorted))
    val t2 = run("t_trend_b3", ds => StreamingOps.trendSlope(ds).toDF(), cuts())
    assert(t1 == t2 && t1.nonEmpty)
  }

  test("streaming trendSlope matches the literal OLS fold, state carries across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = mkEvents
    val (b1, b2) = all.splitAt(3) // the sums must survive the batch boundary
    val ms = MemoryStream[KeyedEvent]
    val q = StreamingOps.trendSlope(ms.toDS()).toDF()
      .writeStream.format("memory").queryName("t_trend").outputMode(OutputMode.Append()).start()
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val got = spark.table("t_trend").select("key", "tsUs", "n", "num", "den", "trend")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    // literal per-key OLS over the growing prefix, driver-side
    val expect = all.groupBy(_.key).toSeq.flatMap { case (k, es) =>
      var n = 0L; var sx = 0L; var sy = 0L; var sxy = 0L; var sxx = 0L
      es.sortBy(e => (e.tsUs, e.value)).map { e =>
        val cents = (BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
        val x = n
        n += 1; sx += x; sy += cents; sxy += x * cents; sxx += x * x
        val num = n * sxy - sx * sy
        val den = n * sxx - sx * sx
        (k, e.tsUs, n, num, den, if (num > 0) "up" else if (num < 0) "down" else "flat")
      }
    }.toSet
    assert(got == expect)
    // and the FINAL per-key statistics equal the batch q_trend_slope
    // formula on the same tape (the monitoring stream converges to the
    // batch answer)
    val finals = got.groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._3) }
    for ((k, es) <- all.groupBy(_.key)) {
      val ys = es.sortBy(e => (e.tsUs, e.value)).map(e =>
        (BigDecimal(e.value).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact)
      val n = ys.size.toLong
      val xs = ys.indices.map(_.toLong)
      val num = n * xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum
      val den = n * xs.map(x => x * x).sum - xs.sum * xs.sum
      assert(finals(k)._4 == num && finals(k)._5 == den, s"key $k final")
    }
  }

  test("chunksTimeout open chunk survives a query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-chunks-ckpt").toString
    val ms = MemoryStream[KeyedEvent]
    def start() = StreamingOps.chunksTimeout(ms.toDS(), 3, 60_000_000L).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$tmp/out/batch_id=$batchId")
      }
      .option("checkpointLocation", s"$tmp/ckpt").start()

    // first query: key 1 buffers [1.0, 2.0] — chunk still OPEN at stop
    ms.addData(Seq(KeyedEvent(1L, 1_000_000L, 1.0), KeyedEvent(1L, 2_000_000L, 2.0)))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // second query from the SAME checkpoint: the 3s event must COMPLETE
    // the recovered buffer (id 1, values [1,2,3]) — lost state would
    // emit nothing and restart ids at 1; the 200s event opens chunk 2,
    // and key 2's 300s event drives the watermark past its deadline so
    // the partial [9.0] flushes via the recovered event-time timer path
    ms.addData(Seq(KeyedEvent(1L, 3_000_000L, 3.0), KeyedEvent(1L, 200_000_000L, 9.0),
      KeyedEvent(2L, 300_000_000L, 50.0)))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(s"$tmp/out")
      .select("key", "chunkId", "n", "firstTsUs", "lastTsUs", "values")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getSeq[Double](5).toList)).toSet
    assert(rows == Set(
      (1L, 1L, 3, 1_000_000L, 3_000_000L, List(1.0, 2.0, 3.0)),
      (1L, 2L, 1, 200_000_000L, 200_000_000L, List(9.0))), rows)
  }

  test("stream-static enrich matches batch enrich") {
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("dk", "tier")
    val sdf = streamOf(mkEvents).toDF()
    val out = StreamingOps.enrich(sdf, dim, "key", "dk")
    runToTable(out, "t_enrich", OutputMode.Append())
    val got = spark.table("t_enrich").select("key", "tsUs", "tier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expect = Joins.enrich(mkEvents.toDF(), dim, "key", "dk")
      .select("key", "tsUs", "tier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == expect)
  }

  test("streaming moments equals a BigInt brute force and is batching-invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Deterministic tape over 3 keys; cents reach ±100k so x⁴ ≈ 1e20
    // exceeds int64 — any silent long overflow in the streaming state
    // would show against the BigInt model. Negatives included: the
    // operator is generic even though the batch oracle's events data
    // happens to be nonnegative.
    val tape: Seq[(String, Long)] = (0 until 240).map { i =>
      (s"k${i % 3}", ((i * i * 7919L) % 200001L) - 100000L)
    } ++ Seq(
      // |x| = 3.05e9: x² = 9.30e18 exceeds Long.MaxValue (9.22e18) —
      // a long×long square would WRAP here while x⁴ = 8.65e37 still
      // fits DECIMAL(38,0); pins that squaring happens in decimal
      ("k0", 3_050_000_000L), ("k1", -3_050_000_000L), ("k2", 3_050_000_000L))
    def run(splits: Seq[Seq[(String, Long)]], name: String): Map[String, (Long, BigInt, BigInt, BigInt, BigInt, BigInt, BigInt, Long)] = {
      val ms = MemoryStream[(String, Long)]
      val out = StreamingOps.moments(ms.toDF().toDF("k0", "cents"), "k0", "cents")
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      splits.foreach { s => ms.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map { r =>
        def big(i: Int): BigInt = BigInt(r.getDecimal(i).toBigInteger)
        r.getString(0) -> ((r.getLong(1), big(2), big(3), big(4), big(5),
          big(6), big(7), r.getLong(8)))
      }.toMap
    }
    val oneBatch = run(Seq(tape), "t_moments_a")
    val manyBatches = run(tape.grouped(37).toSeq, "t_moments_b")
    assert(oneBatch == manyBatches, "micro-batch boundaries changed the sums")
    // independent BigInt model
    tape.groupBy(_._1).foreach { case (k, rows) =>
      val xs = rows.map(r => BigInt(r._2))
      val n = BigInt(xs.size)
      val s1 = xs.sum; val s2 = xs.map(x => x * x).sum
      val s3 = xs.map(x => x * x * x).sum; val s4 = xs.map(x => x * x * x * x).sum
      val m2 = n * s2 - s1 * s1
      val m3 = n * n * s3 - 3 * n * s2 * s1 + 2 * s1 * s1 * s1
      val got = oneBatch(k)
      assert(got == ((xs.size.toLong, s1, s2, s3, s4, m2, m3, m3.signum.toLong)),
        s"key $k: got $got expected (${xs.size}, $s1, $s2, $s3, $s4, $m2, $m3, ${m3.signum})")
    }
    assert(oneBatch.values.map(_._5).max > BigInt(Long.MaxValue),
      "tape failed to exercise the beyond-int64 decimal path")
  }

  test("streaming as-of join equals a brute-force model and is batching-invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Deterministic tape over 4 keys with heavy timestamp collisions
    // ACROSS sides (37 and 100 are coprime → every residue hit), so
    // the <=-inclusive bound and the max-id tie rule both get
    // exercised; 2/3 of records are quotes so the buffer sees
    // out-of-order inserts and multi-candidate picks.
    val raw = (0 until 400).map { i =>
      val key = i % 4
      val base = ((i * 37) % 100) * 1000L
      val isRight = i % 3 != 0
      // key 3's quotes all arrive at ts >= 60 ms, so its earlier
      // probes exercise the unmatched (LEFT) path
      val ts = if (key == 3 && isRight) base + 60_000L else base
      StreamingOps.AsofIn(key, ts, i.toLong, (i % 17) / 10.0, isRight)
    }
    // split-invariance is contractual for IN-ORDER tapes: order by the
    // operator's own (ts, side, id) rule before cutting into batches
    val tape = raw.sortBy(r => (r.tsUs, if (r.isRight) 0 else 1, r.id))
    def run(splits: Seq[Seq[StreamingOps.AsofIn]], name: String): Set[StreamingOps.AsofOut] = {
      val ms = MemoryStream[StreamingOps.AsofIn]
      val q = StreamingOps.asofJoin(ms.toDS()).writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      splits.foreach { s => ms.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[StreamingOps.AsofOut].collect().toSet
    }
    val oneBatch = run(Seq(tape), "t_asof_a")
    val manyBatches = run(tape.grouped(23).toSeq, "t_asof_b")
    assert(oneBatch == manyBatches, "micro-batch boundaries changed the join")
    // independent brute force: per probe, the max-(ts, id) quote of
    // its key with ts <= probe ts
    val expect = raw.filterNot(_.isRight).map { p =>
      val cands = raw.filter(r => r.isRight && r.key == p.key && r.tsUs <= p.tsUs)
      if (cands.isEmpty) StreamingOps.AsofOut(p.key, p.tsUs, p.id, -1L, Long.MinValue, 0.0, matched = false)
      else {
        val q = cands.maxBy(r => (r.tsUs, r.id))
        StreamingOps.AsofOut(p.key, p.tsUs, p.id, q.id, q.tsUs, q.value, matched = true)
      }
    }.toSet
    assert(oneBatch == expect)
    assert(expect.exists(!_.matched) && expect.exists(_.matched),
      "tape failed to exercise both matched and unmatched paths")
  }

  test("streaming funnel equals the batch stage semantics and is batching-invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic multi-user tape with a non-funnel event type mixed
    // in; 73 and 300 share no factors so timestamps collide across
    // users and types, exercising the strict-ordering edges
    val raw = (0 until 600).map { i =>
      StreamingOps.FunnelEvent((i % 37).toLong, ((i * 73) % 300) * 1_000_000L,
        Seq("signup", "click", "purchase", "view")(i % 4))
    }
    val tape = raw.sortBy(e => (e.tsUs, e.eventType))
    def run(splits: Seq[Seq[StreamingOps.FunnelEvent]], name: String): Set[StreamingOps.FunnelTransition] = {
      val ms = MemoryStream[StreamingOps.FunnelEvent]
      val q = StreamingOps.funnel(ms.toDS()).writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      splits.foreach { s => ms.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).as[StreamingOps.FunnelTransition].collect().toSet
    }
    val one = run(Seq(tape), "t_funnel_a")
    val many = run(tape.grouped(41).toSeq, "t_funnel_b")
    assert(one == many, "micro-batch boundaries changed the funnel")
    // brute force mirroring batch q_funnel's min-signup / first-later-
    // click / first-later-purchase semantics
    val expect = raw.groupBy(_.userId).toSeq.flatMap { case (uid, evs) =>
      def tsOf(t: String) = evs.filter(_.eventType == t).map(_.tsUs)
      val s = tsOf("signup").minOption
      val c = s.flatMap(st => tsOf("click").filter(_ > st).minOption)
      val p = c.flatMap(ct => tsOf("purchase").filter(_ > ct).minOption)
      s.map(StreamingOps.FunnelTransition(uid, 1, _)) ++
        c.map(StreamingOps.FunnelTransition(uid, 2, _)) ++
        p.map(StreamingOps.FunnelTransition(uid, 3, _))
    }.toSet
    assert(one == expect)
    // stage counts are monotone and every stage is populated
    val n = (1 to 3).map(st => one.count(_.stage == st))
    assert(n(0) >= n(1) && n(1) >= n(2) && n(2) > 0, n.toString)
  }

  test("streaming HLL distinct equals the batch sketch and is batching-invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 3 keys, overlapping token universes with heavy repetition so the
    // idempotent register-max path (same token in many batches) is
    // exercised alongside genuine cardinality growth
    val tape = (0 until 900).map(i => (s"k${i % 3}", s"tok${(i * 7) % 211}"))
    def run(splits: Seq[Seq[(String, String)]], name: String): Map[String, Long] = {
      val ms = MemoryStream[(String, String)]
      val out = StreamingOps.hllDistinct(ms.toDF().toDF("key", "tok"), "key", "tok")
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      splits.foreach { s => ms.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val one = run(Seq(tape), "t_hll_a")
    val many = run(tape.grouped(77).toSeq, "t_hll_b")
    assert(one == many, "micro-batch boundaries changed the sketch")
    // equals the BATCH sketch estimate on the same data (identical
    // register state), and at this cardinality (≤ 211 per key, far
    // under the lgK=12 sparse threshold) the estimate is EXACT
    val batch = tape.toDF("key", "tok").groupBy("key")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("tok"))).as("est_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == batch)
    val exact = tape.groupBy(_._1).map { case (k, ts) => k -> ts.map(_._2).distinct.size.toLong }
    assert(one == exact, s"sparse-mode HLL should be exact here: $one vs $exact")
  }

  test("streaming heavyHitters: micro-batch splits bit-identical; MG guarantees hold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // skewed tape: t0 a true heavy hitter, t1..t10 mid-band, long tail
    val toks: Seq[String] = (1 to 400).map(_ => "t0") ++
      (1 to 10).flatMap(i => Seq.fill(30)(s"t$i")) ++
      (1 to 300).map(i => s"tail$i")
    val rows = toks.map(t => ("g", t))
    val k = 8
    def run(splits: Int, name: String): Seq[(String, String, Long, Long)] = {
      val ms = MemoryStream[(String, String)]
      val q = StreamingOps.heavyHitters(ms.toDS(), k).toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try rows.grouped(math.max(1, rows.length / splits)).foreach { b =>
        ms.addData(b.toSeq); q.processAllAvailable() }
      finally q.stop()
      // final snapshot = the rows emitted at the max n per group
      val all = spark.table(name).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val maxN = all.map(_._4).max
      all.filter(_._4 == maxN).sortBy(e => (e._1, e._2)).toSeq
    }
    val one = run(1, "t_hh_a")
    val five = run(5, "t_hh_b")
    assert(one == five, "sequential MG fold must be batching-invariant bit-for-bit")
    // guarantees vs exact counts: est ≤ true; support ⊇ {freq > n/(k+1)}
    val exact = toks.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val n = toks.size.toLong
    val est = one.map(e => e._2 -> e._3).toMap
    assert(est.size <= k)
    est.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overestimated: $c > ${exact(t)}")
      assert(exact(t) - c <= n / (k + 1), s"$t undershoots past n/(k+1): $c vs ${exact(t)}") }
    exact.filter { case (_, c) => c * (k + 1) > n }.keys.foreach { t =>
      assert(est.contains(t), s"guaranteed hitter $t missing from support") }
  }
}
