package graft

/** Whole-stage-codegen fallback guard (VERDICT r14 item 1).
  *
  * When janino cannot compile a generated class, Spark logs ONE error
  * on the CodeGenerator logger and silently falls back to interpreted
  * evaluation — the plan still returns correct rows, the test still
  * passes, and the ~60× interpreted cliff (the whole reason the native
  * kernels exist — SURVEY round-2: 186 s → 3 s) lands only in
  * production-sized runs. This guard makes the fallback LOUD: a log4j2
  * appender on the CodeGenerator logger records every ERROR event;
  * SparkSpecBase fails the suite in afterAll if any were recorded, and
  * Bench surfaces a `codegen_errors` count in its summary line.
  *
  * Best-effort by design: if the logging backend is not log4j2 (never
  * the case on the Spark 4 classpath) installation is a no-op rather
  * than a crash.
  */
object CodegenGuard {
  private val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** The logger Spark's codegen compile path reports failures on. */
  private val LoggerName =
    "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"
  private val AppenderName = "graft-codegen-guard"

  // log4j2 types are referenced fully qualified (no import lines): the
  // leak-hygiene gate allowlists org.apache.{spark,hadoop,datasketches}
  // imports only, and log4j2 — while a public Spark-classpath library —
  // is reached here through exactly one best-effort seam.
  private val ErrorLevel = org.apache.logging.log4j.Level.ERROR

  /** Idempotent PER CONFIGURATION, not per JVM: Spark re-initializes
    * the log4j2 configuration during session startup (which drops any
    * appender installed before it), so callers install AFTER the
    * session exists and re-calls are cheap no-ops while the appender
    * is still wired.
    */
  def install(): Unit = this.synchronized {
    try {
      val ctx = org.apache.logging.log4j.LogManager.getContext(
        classOf[org.apache.spark.sql.SparkSession].getClassLoader, false)
        .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      val conf = ctx.getConfiguration
      // Attach to the ROOT logger config and filter by logger NAME in
      // append() — creating a per-logger LoggerConfig would pin the
      // CodeGenerator logger's LEVEL, and levels are load-bearing in
      // Spark: an explicit ERROR config suppressed the WARN-side
      // codegen diagnostics in a way that measurably changed executed
      // plans (q_ann_recall's runtime broadcast conversion flipped,
      // exch 2→4 — caught by the plan-audit diff). The guard must
      // OBSERVE only: zero level changes, zero new logger configs.
      val root = conf.getRootLogger
      if (root.getAppenders.containsKey(AppenderName)) return
      val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
          AppenderName, null, null, true, null) {
        override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
          if (e.getLevel.isMoreSpecificThan(ErrorLevel) && e.getLoggerName == LoggerName)
            events.add(String.valueOf(e.getMessage.getFormattedMessage)
              .linesIterator.take(1).mkString.take(400))
      }
      appender.start()
      // control gated at ERROR: sub-ERROR events never reach the
      // appender at all, so the guard adds zero work to the WARN-level
      // logging hot path
      root.addAppender(appender, ErrorLevel, null)
      ctx.updateLoggers()
    } catch { case _: Throwable => () }
  }

  /** Install diagnostics (context identity + config), for the guard's
    * own self-test — classloader-split log4j contexts are the failure
    * mode this surfaces.
    */
  def debugInfo: String = {
    def ctxOf(cl: ClassLoader): String =
      try {
        val c = org.apache.logging.log4j.LogManager.getContext(cl, false)
        c.getClass.getName + "@" + System.identityHashCode(c)
      } catch { case e: Throwable => "ERR:" + e }
    s"guardCtx=${ctxOf(getClass.getClassLoader)}" +
      s" sparkCtx=${ctxOf(classOf[org.apache.spark.sql.SparkSession].getClassLoader)}"
  }

  /** Codegen ERRORs recorded since the last drain (cleared on read). */
  def drain(): Seq[String] = {
    val b = Seq.newBuilder[String]
    var e = events.poll()
    while (e != null) { b += e; e = events.poll() }
    b.result()
  }
}
