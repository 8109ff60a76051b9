package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement aid (guide §1): phase attribution for the requantize gates
  * — seed/fold fixture, the rebuild transaction, and the pinned serve are
  * timed separately so an optimization targets the phase that actually
  * costs. Stderr only; no artifact writes. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    graft.sources.FastLocalFileSystem.install()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.types.RegionSpanUDT.register()
    // per-phase job accounting: jobs counted + summed so driver-side time
    // (planning, commit I/O) shows as the wall - jobs gap
    val jobCount = new java.util.concurrent.atomic.AtomicInteger()
    val jobNanos = new java.util.concurrent.atomic.AtomicLong()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { t0 =>
          jobCount.incrementAndGet()
          jobNanos.addAndGet(System.nanoTime() - t0)
        }
      }
    })
    def time[T](what: String)(f: => T): T = {
      val c0 = jobCount.get(); val n0 = jobNanos.get()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give them a beat
      Thread.sleep(100)
      System.err.println(f"ANNPROBE $what: $wall%.3f s  " +
        f"jobs=${jobCount.get() - c0} jobTime=${(jobNanos.get() - n0) / 1e9}%.3f s")
      r
    }
    // 20 ms stack sampler over the MAIN thread: a driver-side histogram
    // (the wall - jobTime gap is driver work; this names it)
    def sampled[T](what: String)(f: => T): T = {
      val main = Thread.currentThread()
      val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var stop = false
      val shellDumped = new java.util.concurrent.atomic.AtomicInteger()
      val t = new Thread(() => {
        while (!stop) {
          val st = main.getStackTrace
          if (st.exists(_.getClassName.contains("hadoop.util.Shell")) &&
              shellDumped.incrementAndGet() <= 4)
            System.err.println("  SHELLSTACK " + st.take(34).mkString(" <- "))
          // first graft/spark frame below the probe wrapper
          val key = st.find(e =>
              e.getClassName.startsWith("org.apache.hadoop") ||
              e.getClassName.startsWith("graft") ||
              e.getClassName.contains("catalyst") ||
              e.getClassName.contains("execution"))
            .map(e => s"${e.getClassName}.${e.getMethodName}")
            .getOrElse(st.headOption.map(e =>
              s"${e.getClassName}.${e.getMethodName}").getOrElse("?"))
          hist.merge(key, 1, (a, b) => a + b)
          Thread.sleep(20)
        }
      })
      t.setDaemon(true); t.start()
      try f finally {
        stop = true; t.join(200)
        val top = hist.entrySet().toArray(Array.empty[java.util.Map.Entry[String, Integer]])
          .sortBy(-_.getValue.toInt).take(12)
        top.foreach(e => System.err.println(s"  SAMPLE $what ${e.getValue}  ${e.getKey}"))
      }
    }
    val ns2 = "gcat.ann6"
    time("seed")(Engine2.ann3Seed(spark, ns2, dir))
    time("mutate+fold")(Engine2.ann3MutateAndFold(spark, ns2))
    // warm pass then timed passes, mirroring the bench's min-of-3
    for (round <- 1 to 3) {
      time(s"requantize(seedq) r$round") {
        if (round == 2) sampled("requantize")(Engine2.ann3Requantize(spark, ns2))
        else Engine2.ann3Requantize(spark, ns2)
      }
      time(s"requantize(retrain) r$round") {
        spark.conf.set("spark.graft.ann.requantize.retrain", "true")
        try Engine2.ann3Requantize(spark, ns2)
        finally spark.conf.unset("spark.graft.ann.requantize.retrain")
      }
      time(s"serve r$round") { if (round == 2) sampled("serve")(serveOnce(spark, ns2, dir)) else serveOnce(spark, ns2, dir) }
    }
    spark.stop()
  }

  private def serveOnce(spark: SparkSession, ns2: String, dir: String): Long = {
    {
        val pin = Engine3.ServePin.of(spark, ns2)
        val centT = Engine2.regroupCent(pin.table("ann3_cent"))
        val bookT = Engine2.regroupBook(pin.table("ann3_book"))
        val tombMax = Engine2.ann3TombMaxOpt(spark, ns2, pin)
        val proof = Engine2.ann3Surviving(pin.table("ann3_post"), tombMax)
          .agg(count(lit(1)).cast("long").as("n_live"))
          .crossJoin(broadcast(pin.table("ann3_del")
            .agg(count(lit(1)).cast("long").as("n_tomb"))))
          .crossJoin(broadcast(centT
            .agg(count(lit(1)).cast("long").as("n_cent"))))
        val t = graft.Tables(spark, dir)
        val e = t.embeddings.select(col("vec_id"),
          col("embedding").cast("array<double>").as("e"))
        Engine2.annServe(e, centT, bookT,
          probed => Engine2.ann3Surviving(pin.table("ann3_post")
            .where(col("list_id").isin(probed: _*)), tombMax),
          proof = Some(proof)).count()
      }
  }
}
