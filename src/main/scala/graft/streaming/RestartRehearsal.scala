package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Mid-run kill/restart rehearsal for the stateful streaming operators
  * (round-13 item: checkpoint recovery was unit-tested on a toy tape;
  * this drives the REAL event tape through a replayable file source,
  * kills the query mid-tape, restarts from the RocksDB checkpoint, and
  * asserts output parity with an uninterrupted run).
  *
  * Why a file source: MemoryStream (the bench tape) is not recoverable
  * across query restarts — replayability is a property of the SOURCE,
  * and the file source + checkpoint + exactly-once file sink is the
  * production recovery contract Structured Streaming actually ships.
  * The tape is the events table sorted by time and split into N
  * parquet chunk files with strictly increasing modification times, so
  * `maxFilesPerTrigger=1` replays it as N in-order micro-batches —
  * the same shape as the bench's MemoryStream tape.
  *
  * Parity contract per operator:
  *  - Append-mode ops (sessionize / ewma / cusum): the exactly-once
  *    parquet sink's committed rows must be IDENTICAL (as multisets)
  *    between the interrupted-then-recovered run and the uninterrupted
  *    run — recovery replays the in-flight batch, the sink's
  *    _spark_metadata commits each batch once.
  *  - Update-mode ops (quantiles): emission is at-least-once under
  *    foreachBatch, so the contract is the FINAL snapshot per key
  *    (row at the max committed batch per key) — state recovery makes
  *    the replayed batch emit byte-identical snapshots.
  *
  * Usage: `runMain graft.streaming.RestartRehearsal <sfDir> <workDir>
  * [nChunks] [stopAfterBatch]` — prints one JSON line per op and a
  * summary line, and writes the record durably via Bench.durableWrite.
  */
object RestartRehearsal {

  /** The ops rehearsed: name → (query builder, output mode). The four
    * heaviest RocksDB-stateful shapes from the bench's streaming
    * section: per-key session assignment, the two linear-recurrence
    * folds, and the KLL quantile monitor (Update mode).
    */
  def ops(spark: SparkSession): Seq[(String, Dataset[KeyedEvent] => DataFrame, OutputMode)] = Seq(
    ("sessionize", (ds: Dataset[KeyedEvent]) => StreamingOps.sessionize(ds, 1_800_000_000L).toDF(),
      OutputMode.Append()),
    ("ewma", (ds: Dataset[KeyedEvent]) => StreamingOps.ewma(ds).toDF(), OutputMode.Append()),
    ("cusum", (ds: Dataset[KeyedEvent]) => StreamingOps.cusum(ds,
      targetCents = 10_000L, thresholdCents = 100_000L).toDF(), OutputMode.Append()),
    ("quantiles", (ds: Dataset[KeyedEvent]) => StreamingOps.quantiles(ds).toDF(),
      OutputMode.Update()))

  /** Write the events table as `nChunks` in-order parquet chunk files
    * under `tapeDir` with strictly increasing mtimes (the file
    * source's ordering key), one micro-batch each. Returns row count.
    */
  def buildTape(spark: SparkSession, sfDir: String, tapeDir: String, nChunks: Int): Long = {
    import spark.implicits._
    val tape = graft.Queries.events(spark, sfDir)
      .select(col("user_id").cast("long").as("key"), unix_micros(col("ts")).as("tsUs"),
        col("value").cast("double").as("value"))
      .orderBy(col("tsUs"), col("key"), col("value"))
      .as[KeyedEvent]
    val rows = tape.collect() // tape scale is bench scale: bounded by design
    val n = rows.length
    val dir = java.nio.file.Paths.get(tapeDir)
    java.nio.file.Files.createDirectories(dir)
    val chunk = math.max(1, (n + nChunks - 1) / nChunks)
    rows.grouped(chunk).zipWithIndex.foreach { case (batch, i) =>
      val tmp = s"$tapeDir/__tmp_$i"
      spark.createDataset(batch.toSeq).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
      val target = dir.resolve(f"chunk_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, target)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      // strictly increasing mtimes pin the replay order
      java.nio.file.Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(1_000_000_000_000L + i * 60_000L)): Unit
    }
    n.toLong
  }

  private def fileStream(spark: SparkSession, tapeDir: String): Dataset[KeyedEvent] = {
    import spark.implicits._
    spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[KeyedEvent].schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(tapeDir)
      .as[KeyedEvent]
  }

  /** Run one op to completion over the tape. If `stopAfterBatch` is
    * set, the query is killed as soon as the checkpoint has committed
    * that batch id (mid-tape — later batches still pending) and then
    * RESTARTED from the same checkpoint to drain the rest. Returns
    * (wall seconds total, wall seconds of the recovery phase).
    */
  def runOnce(spark: SparkSession, tapeDir: String, outDir: String, ckptDir: String,
      mk: Dataset[KeyedEvent] => DataFrame, mode: OutputMode,
      stopAfterBatch: Option[Int]): (Double, Double) = {
    def start() = {
      val df = mk(fileStream(spark, tapeDir))
      if (mode == OutputMode.Append())
        df.writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckptDir).outputMode(mode).start()
      else
        // Update mode has no exactly-once file sink; foreachBatch with
        // the batch id column gives the last-snapshot-per-key contract
        df.writeStream.outputMode(mode)
          .option("checkpointLocation", ckptDir)
          .foreachBatch { (batch: DataFrame, id: Long) =>
            batch.withColumn("__batch", lit(id))
              .write.mode("append").parquet(outDir)
          }.start()
    }
    val t0 = System.nanoTime()
    stopAfterBatch match {
      case None =>
        val q = start()
        try q.processAllAvailable() finally q.stop()
        val s = (System.nanoTime() - t0) / 1e9
        (s, s)
      case Some(k) =>
        val q = start()
        try {
          // kill once batch k is committed — later batches pending
          while (Option(q.lastProgress).forall(_.batchId < k) && q.isActive)
            Thread.sleep(50)
        } finally q.stop()
        val t1 = System.nanoTime()
        val q2 = start()
        try q2.processAllAvailable() finally q2.stop()
        val t2 = System.nanoTime()
        ((t2 - t0) / 1e9, (t2 - t1) / 1e9)
    }
  }

  /** Multiset of output rows for the parity compare (append ops), or
    * the last-batch snapshot per key (update ops).
    */
  def outputSignature(spark: SparkSession, outDir: String, update: Boolean): Seq[String] = {
    val df = spark.read.parquet(outDir)
    val rows =
      if (!update) df
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("key")).orderBy(col("__batch").desc)
        df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .drop("__rn", "__batch")
      }
    rows.collect().map(_.toString).sorted.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-restart").toString)
    val nChunks = args.lift(2).map(_.toInt).getOrElse(10)
    val stopAfter = args.lift(3).map(_.toInt).getOrElse(nChunks / 2 - 1)
    val spark = graft.GraftSession.local("graft-restart-rehearsal")
    spark.sparkContext.setLogLevel("WARN")
    val tapeDir = s"$workDir/tape"
    val rows = buildTape(spark, sfDir, tapeDir, nChunks)
    val results = ops(spark).map { case (name, mk, mode) =>
      val upd = mode == OutputMode.Update()
      val (refS, _) = runOnce(spark, tapeDir, s"$workDir/$name/ref_out",
        s"$workDir/$name/ref_ckpt", mk, mode, None)
      val (totS, recS) = runOnce(spark, tapeDir, s"$workDir/$name/rec_out",
        s"$workDir/$name/rec_ckpt", mk, mode, Some(stopAfter))
      val a = outputSignature(spark, s"$workDir/$name/ref_out", upd)
      val b = outputSignature(spark, s"$workDir/$name/rec_out", upd)
      val ok = a == b
      val line = f"""{"op":"$name","rows":$rows,"parity":$ok,""" +
        f""""uninterrupted_sec":$refS%.1f,"interrupted_total_sec":$totS%.1f,""" +
        f""""recovery_sec":$recS%.1f,"recovered_rows_per_sec":${rows / totS}%.0f,""" +
        f""""out_rows":${a.length}}"""
      println(line)
      (name, ok, line)
    }
    val allOk = results.forall(_._2)
    val sfName = sfDir.split('/').last
    val doc = s"""{"rehearsal":"streaming_restart","sf":"$sfDir","chunks":$nChunks,""" +
      s""""stop_after_batch":$stopAfter,"all_parity":$allOk,"ops":[""" +
      results.map(_._3).mkString(",") + "]}"
    println(doc)
    graft.Bench.durableWrite(s"restart_${sfName}_r13", doc): Unit
    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
