package graft

import org.apache.spark.sql.functions._

/** Streaming throughput at SCALE tapes (VERDICT r14 item 7).
  *
  * The per-round streaming section reads ~16k rows/s at the 100k-row
  * sf0.1 tape — a number dominated by FIXED micro-batch latency (~10
  * batches × ~0.5 s of plan/commit overhead), not per-row cost. This
  * main separates intercept from slope for the three cheapest ops
  * (ewma, funnel, cms_freq):
  *
  *  - tape sizes: every dir passed on the command line (default
  *    sf0.1 → 100k; pass testdata_sf1 / testdata_sf10 for 1M / 10M) at
  *    the standard 10 micro-batches — rows/s vs tape size is the
  *    curve;
  *  - trigger-interval sensitivity: the largest tape re-runs at 100
  *    micro-batches — same rows, 10× the batch count; the wall-time
  *    delta ÷ 90 extra batches is the per-batch fixed cost.
  *
  * Usage: `runMain graft.StreamScale [sfDir ...]`; one JSON line per
  * (op, tape, batches) plus a summary, durably written via
  * Bench.durableWrite as stream_scale_r<N>. Collecting a 10M-row tape
  * to the driver needs SPARK_DRIVER_MEM=24g.
  */
object StreamScale {

  final case class Reading(op: String, dir: String, rows: Int, batches: Int, sec: Double,
      stateRows: Long, stateBytes: Long) {
    def json: String =
      f"""{"op":"$op","sf":"$dir","rows":$rows,"batches":$batches,"sec":$sec%.3f,""" +
        f""""rows_per_sec":${if (sec > 0) rows / sec else 0.0}%.0f,""" +
        s""""state_rows":$stateRows,"state_bytes":$stateBytes}"""
  }

  /** Peak state-operator size across the run's micro-batches
    * (VERDICT r15 item 7: the "bounded state" claims — ≤4 KiB HLL
    * registers, k MG counters, 3 longs per sessionize key — measured at
    * the 10M tape, not asserted). numRowsTotal is the store's row
    * count; bytes is memoryUsedBytes with the RocksDB total-memory
    * custom metric as fallback (the RocksDB provider reports its
    * memtable+block-cache there).
    *
    * Captured via a StreamingQueryListener rather than polling
    * q.recentProgress after the fact (ADVICE r16): that buffer is
    * capped at spark.sql.streaming.numRecentProgressUpdates (default
    * 100), so the 100-batch trigger-sensitivity run could evict its
    * early entries, and the final batch's progress event may not have
    * been posted yet when the poll runs — both understate the peak.
    * The listener sees every QueryProgressEvent exactly once; peaks
    * accumulate per runId (events for one query arrive sequentially on
    * the bus, so plain max-update is safe).
    */
  private final class PeakListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val rows = scala.collection.concurrent.TrieMap.empty[java.util.UUID, Long]
    val bytes = scala.collection.concurrent.TrieMap.empty[java.util.UUID, Long]
    val events = scala.collection.concurrent.TrieMap.empty[java.util.UUID, Long]
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val ops = Option(p.stateOperators).toSeq.flatten
      if (ops.nonEmpty) {
        val r = ops.map(_.numRowsTotal).max
        val b = ops.map { o =>
          val custom = Option(o.customMetrics)
            .map(m => java.lang.Long.valueOf(m.getOrDefault("rocksdbTotalMemoryUsage", 0L).toString).longValue)
            .getOrElse(0L)
          math.max(o.memoryUsedBytes, custom)
        }.max
        rows.put(p.runId, math.max(rows.getOrElse(p.runId, 0L), r))
        bytes.put(p.runId, math.max(bytes.getOrElse(p.runId, 0L), b))
      }
      events.put(p.runId, events.getOrElse(p.runId, 0L) + 1): Unit
    }

    /** Peaks for a STOPPED query, after draining the async listener
      * bus: spin until no new progress event for this runId arrives in
      * a 100 ms window (≤ 5 s cap) — the final batch's event posts
      * asynchronously after q.stop() returns.
      */
    def awaitPeak(q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) = {
      var last = -1L
      var cur = events.getOrElse(q.runId, 0L)
      var spins = 0
      while (cur != last && spins < 50) {
        last = cur
        Thread.sleep(100)
        cur = events.getOrElse(q.runId, 0L)
        spins += 1
      }
      (rows.getOrElse(q.runId, 0L), bytes.getOrElse(q.runId, 0L))
    }
  }

  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.{KeyedEvent, StreamingOps}
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "testdata_sf1", "testdata_sf10")
    val spark = GraftSession.local("graft-stream-scale")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val peaks = new PeakListener
    spark.streams.addListener(peaks)

    def tapeOf(dir: String): Array[KeyedEvent] =
      Queries.events(spark, dir)
        .select(col("user_id").cast("long").as("k"), unix_micros(col("ts")).as("t"),
          col("value").cast("double").as("v"))
        .orderBy(col("t"), col("k"), col("v"))
        .collect().map(r => KeyedEvent(r.getLong(0), r.getLong(1), r.getDouble(2)))

    def run(tape: Array[KeyedEvent], dir: String, batches: Int,
        op: String, mode: OutputMode)(
        mk: org.apache.spark.sql.Dataset[KeyedEvent] => org.apache.spark.sql.DataFrame): Reading = {
      val groups = tape.grouped(math.max(1, tape.length / batches)).map(_.toSeq).toSeq
      val ms = MemoryStream[KeyedEvent]
      val t0 = System.nanoTime()
      val q = mk(ms.toDS()).writeStream.format("noop").outputMode(mode).start()
      try groups.foreach { b => ms.addData(b); q.processAllAvailable() } finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val st = peaks.awaitPeak(q)
      Reading(op, dir, tape.length, groups.length, sec, st._1, st._2)
    }

    def cmsRun(tape: Array[KeyedEvent], dir: String, batches: Int): Reading = {
      val ms = MemoryStream[(String, String)]
      val pairs = tape.map(e => ((e.key % 8).toString, e.key.toString))
      val groups = pairs.grouped(math.max(1, pairs.length / batches)).map(_.toSeq).toSeq
      val t0 = System.nanoTime()
      val q = StreamingOps.cmsFreq(ms.toDS(), 4, 256, (0L until 10L).map(_.toString))
        .toDF().writeStream.format("noop").outputMode(OutputMode.Update()).start()
      try groups.foreach { b => ms.addData(b); q.processAllAvailable() } finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val st = peaks.awaitPeak(q)
      Reading("cms_freq", dir, pairs.length, groups.length, sec, st._1, st._2)
    }

    // the two sketch twins stream the same (key-bucket, token) pairs as
    // the per-round bench section — state-size claims under test:
    // ≤4 KiB HLL register block per bucket, ≤32 MG counters per bucket
    def pairRun(tape: Array[KeyedEvent], dir: String, batches: Int, op: String)(
        mk: org.apache.spark.sql.Dataset[(String, String)] => org.apache.spark.sql.DataFrame): Reading = {
      val ms = MemoryStream[(String, String)]
      val pairs = tape.map(e => ((e.key % 8).toString, e.key.toString))
      val groups = pairs.grouped(math.max(1, pairs.length / batches)).map(_.toSeq).toSeq
      val t0 = System.nanoTime()
      val q = mk(ms.toDS()).writeStream.format("noop")
        .outputMode(OutputMode.Update()).start()
      try groups.foreach { b => ms.addData(b); q.processAllAvailable() } finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val st = peaks.awaitPeak(q)
      Reading(op, dir, pairs.length, groups.length, sec, st._1, st._2)
    }

    def funnelRun(tape: Array[KeyedEvent], dir: String, batches: Int): Reading = {
      val ms = MemoryStream[StreamingOps.FunnelEvent]
      val recs = tape.map { e =>
        val tpe = (e.value % 4).toInt match {
          case 0 => "signup"; case 1 => "click"; case 2 => "purchase"; case _ => "view"
        }
        StreamingOps.FunnelEvent(e.key, e.tsUs, tpe)
      }
      val groups = recs.grouped(math.max(1, recs.length / batches)).map(_.toSeq).toSeq
      val t0 = System.nanoTime()
      val q = StreamingOps.funnel(ms.toDS()).toDF().writeStream.format("noop")
        .outputMode(OutputMode.Append()).start()
      try groups.foreach { b => ms.addData(b); q.processAllAvailable() } finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val st = peaks.awaitPeak(q)
      Reading("funnel", dir, recs.length, groups.length, sec, st._1, st._2)
    }

    val out = Seq.newBuilder[Reading]
    dirs.foreach { dir =>
      val tape = tapeOf(dir)
      out += run(tape, dir, 10, "ewma", OutputMode.Append())(ds => StreamingOps.ewma(ds).toDF())
      out += funnelRun(tape, dir, 10)
      out += cmsRun(tape, dir, 10)
      // round 16 (VERDICT r15 item 7): the bounded-state claims measured
      // — sessionize (3 longs/key), HLL registers, MG counters
      out += run(tape, dir, 10, "sessionize", OutputMode.Append())(ds =>
        StreamingOps.sessionize(ds, 1_800_000_000L).toDF())
      out += pairRun(tape, dir, 10, "hll_distinct")(ds =>
        StreamingOps.hllDistinct(ds.toDF().toDF("key", "tok"), "key", "tok"))
      out += pairRun(tape, dir, 10, "heavy_hitters")(ds =>
        StreamingOps.heavyHitters(ds, 32).toDF())
      // trigger sensitivity on the largest tape: same rows, 10× batches
      if (dir == dirs.last) {
        out += run(tape, dir, 100, "ewma", OutputMode.Append())(ds => StreamingOps.ewma(ds).toDF())
        out += funnelRun(tape, dir, 100)
        out += cmsRun(tape, dir, 100)
      }
      // round 18 (VERDICT r17 item 9): the LARGER-batch leg — the same
      // tape in ONE micro-batch. t(1 batch) is the op's engine floor at
      // this row volume; (t(10) − t(1)) / 9 is the per-batch cadence
      // cost, so the cadence share of the per-round bench's 6–13 s
      // per-op walls gets a measured number instead of an inference.
      if (dir == dirs.head) {
        out += run(tape, dir, 1, "ewma", OutputMode.Append())(ds => StreamingOps.ewma(ds).toDF())
        out += funnelRun(tape, dir, 1)
        out += cmsRun(tape, dir, 1)
        out += run(tape, dir, 1, "sessionize", OutputMode.Append())(ds =>
          StreamingOps.sessionize(ds, 1_800_000_000L).toDF())
        out += pairRun(tape, dir, 1, "hll_distinct")(ds =>
          StreamingOps.hllDistinct(ds.toDF().toDF("key", "tok"), "key", "tok"))
        out += pairRun(tape, dir, 1, "heavy_hitters")(ds =>
          StreamingOps.heavyHitters(ds, 32).toDF())
      }
    }
    val readings = out.result()
    readings.foreach(r => println(r.json))
    val round = sys.env.get("SPARK_GRAFT_ROUND").orElse(Bench.nextRound()).getOrElse("x")
    val doc = s"""{"rehearsal":"stream_scale","readings":[${readings.map(_.json).mkString(",")}]}"""
    println(doc)
    Bench.durableWrite(s"stream_scale_r$round", doc): Unit
    spark.stop()
  }
}
