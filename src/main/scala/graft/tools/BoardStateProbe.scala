package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnoses ORDER-DEPENDENT board slowdowns (r17: t20_bpe_ids measured
  * 21 s as min-of-4 on the full 160-row board vs 3.5-4.4 s isolated —
  * a ~6x degradation that no family subset reproduced).
  *
  * Replays one full board round under the exact Bench session config,
  * probing a target query BEFORE the round and after EVERY FAMILY, with
  * the whole-stage-codegen compile-time counters
  * (org.apache.spark.metrics.source.CodegenMetrics) and the
  * plan-vs-execute wall split printed per probe — separating "the plan
  * got slower" from "planning/compilation got slower" from "the host is
  * hot" (a fixed CPU canary prints alongside).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BoardStateProbe t20_bpe_ids"
  */
object BoardStateProbe {
  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("t20_bpe_ids")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.metrics.source.CodegenMetrics._
    def compileMs: Long = METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
    def compileCount: Long = METRIC_COMPILATION_TIME.getCount

    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, 32)
        .agg(org.apache.spark.sql.functions.sum("id")).head()
      (System.nanoTime() - t0) / 1e9
    }

    // paired probe: the CONTROL query (t19 — the same narrow BPE stream
    // without t20's vocab join) times under the identical host window,
    // so target/control separates real plan state from host bursts
    val control = sys.env.getOrElse("SPARK_GRAFT_PROBE_CONTROL", "t19_bpe_tokens")
    // job timeline listener: a stalled probe exec splits into either one
    // long JOB (task-side stall) or a long GAP between jobs (driver-side)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobs.getOrDefault(je.jobId, (je.time, "?"))
        done.add((je.jobId, t0, je.time, desc))
      }
    })
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = { var s = 0L; gcBeans.forEach(b => s += b.getCollectionTime); s }
    // JIT code-cache occupancy: when the profiled/non-profiled nmethod
    // heaps run out, the JVM stops (or thrashes) JIT compilation and
    // interpreted Catalyst eval paths fall off a cliff
    def codeCache: String = {
      val sb = new StringBuilder
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.forEach { p =>
        if (p.getName.startsWith("CodeHeap")) {
          val u = p.getUsage
          sb.append(f"${p.getName.replaceAll("CodeHeap '|'", "").replaceAll(" nmethods", "")}=" +
            f"${u.getUsed / 1048576}%d/${u.getMax / 1048576}%dM ")
        }
      }
      sb.result().trim
    }

    def one(name: String): (Double, Double, Long, Long) = {
      val cm0 = compileMs; val cc0 = compileCount
      done.clear()
      val g0 = gcMs
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.executedPlan // force analysis+planning
      val t1 = System.nanoTime()
      val w0 = System.currentTimeMillis()
      // watchdog: if the save is still running after 8 s, dump every
      // thread's stack (the stalled task thread is RUNNABLE inside it)
      val saveDone = new java.util.concurrent.atomic.AtomicBoolean(false)
      val dog = new Thread(() => {
        var waited = 0
        while (!saveDone.get() && waited < 8000) { Thread.sleep(100); waited += 100 }
        if (!saveDone.get()) {
          import scala.jdk.CollectionConverters._
          val stacks = Thread.getAllStackTraces.asScala
          println(s"[dog] dump at +${System.currentTimeMillis() - w0} ms, ${stacks.size} threads")
          stacks.foreach { case (t, st) =>
            if (st.nonEmpty && (t.getState == Thread.State.RUNNABLE || t.getName == "main")
                && !t.getName.contains("dog")) {
              val top = st.take(14).map(_.toString)
              if (top.exists(f => !f.startsWith("java.") && !f.startsWith("jdk.") &&
                  !f.startsWith("sun.") && !f.startsWith("io.netty")))
                println(s"[dog] ${t.getName} ${t.getState}\n" +
                  top.map("[dog]    " + _).mkString("\n"))
            }
          }
        }
      }, "stall-dog")
      dog.setDaemon(true)
      dog.start()
      df.write.mode("overwrite").format("noop").save()
      saveDone.set(true)
      val t2 = System.nanoTime()
      val exec = (t2 - t1) / 1e9
      if (exec > 8.0) { // a stall: print the job timeline + GC share
        println(f"[stall] $name exec=$exec%.1fs gc=${gcMs - g0} ms; jobs (start-offset ms, dur ms):")
        import scala.jdk.CollectionConverters._
        done.asScala.toSeq.sortBy(_._2).foreach { case (id, s, e, d) =>
          println(f"[stall]   job $id%3d +${s - w0}%6d ${e - s}%6d ms  ${d.take(60)}")
        }
      }
      ((t1 - t0) / 1e9, exec, compileCount - cc0, compileMs - cm0)
    }
    def probe(tag: String): Unit = {
      val c = one(control)
      val t = one(target)
      println(f"[probe] $tag%-28s ctl(plan=${c._1}%.2f exec=${c._2}%.2f) " +
        f"tgt(plan=${t._1}%.2f exec=${t._2}%.2f) ratio=${t._2 / c._2}%.2f " +
        f"compiled=${t._3} units in ${t._4} ms canary=${canary()}%.2fs cc[$codeCache]")
      System.gc()
    }

    graft.Tables.registerAll(spark, sfDir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    probe("before-board")
    probe("before-board-2")
    // optional comma-separated family/prefix filter (e.g. FAMILIES=a01,a09)
    // to bisect WHICH board predecessor plants the slow state
    val fams = sys.env.get("SPARK_GRAFT_PROBE_FAMILIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => n == target || n == control)
      .filter(n => fams.forall(_.exists(n.startsWith)))
    var fam = ""
    for (name <- names) {
      val f = name.takeWhile(_ != '_').take(1)
      if (fam.nonEmpty && f != fam) probe(s"after-$fam")
      fam = f
      try graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[probe] $name failed: ${e.getMessage}") }
      System.gc()
    }
    probe(s"after-$fam")
    probe("after-board-2")
    spark.stop()
  }
}
