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

  /** Peak state-operator size observed across the run's micro-batches
    * (VERDICT r15 item 7: the "bounded state" claims — ≤4 KiB HLL
    * registers, k MG counters, 3 longs per sessionize key — measured at
    * the 10M tape, not asserted). numRowsTotal is the store's row
    * count; bytes is memoryUsedBytes with the RocksDB total-memory
    * custom metric as fallback (the RocksDB provider reports its
    * memtable+block-cache there).
    */
  private def peakState(q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long) = {
    val ops = q.recentProgress.flatMap(p => Option(p.stateOperators).toSeq.flatten)
    if (ops.isEmpty) (0L, 0L)
    else {
      val rows = ops.map(_.numRowsTotal).max
      val bytes = ops.map { o =>
        val custom = Option(o.customMetrics)
          .map(m => java.lang.Long.valueOf(m.getOrDefault("rocksdbTotalMemoryUsage", 0L).toString).longValue)
          .getOrElse(0L)
        math.max(o.memoryUsedBytes, custom)
      }.max
      (rows, bytes)
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
      val st = try {
        groups.foreach { b => ms.addData(b); q.processAllAvailable() }
        peakState(q)
      } finally q.stop()
      Reading(op, dir, tape.length, groups.length, (System.nanoTime() - t0) / 1e9, st._1, st._2)
    }

    def cmsRun(tape: Array[KeyedEvent], dir: String, batches: Int): Reading = {
      val ms = MemoryStream[(String, String)]
      val pairs = tape.map(e => ((e.key % 8).toString, e.key.toString))
      val groups = pairs.grouped(math.max(1, pairs.length / batches)).map(_.toSeq).toSeq
      val t0 = System.nanoTime()
      val q = StreamingOps.cmsFreq(ms.toDS(), 4, 256, (0L until 10L).map(_.toString))
        .toDF().writeStream.format("noop").outputMode(OutputMode.Update()).start()
      val st = try {
        groups.foreach { b => ms.addData(b); q.processAllAvailable() }
        peakState(q)
      } finally q.stop()
      Reading("cms_freq", dir, pairs.length, groups.length, (System.nanoTime() - t0) / 1e9,
        st._1, st._2)
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
      val st = try {
        groups.foreach { b => ms.addData(b); q.processAllAvailable() }
        peakState(q)
      } finally q.stop()
      Reading(op, dir, pairs.length, groups.length, (System.nanoTime() - t0) / 1e9,
        st._1, st._2)
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
      val st = try {
        groups.foreach { b => ms.addData(b); q.processAllAvailable() }
        peakState(q)
      } finally q.stop()
      Reading("funnel", dir, recs.length, groups.length, (System.nanoTime() - t0) / 1e9,
        st._1, st._2)
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
