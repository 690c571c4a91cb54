package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc: run one streaming-replay query under bench confs and dump
  * the engine's own per-batch progress JSON (durationMs breakdown —
  * addBatch / getBatch / commitOffsets / stateOperators) so the
  * micro-batch floor can be attributed instead of guessed at.
  * Progress events are collected via a listener because the memory /
  * parquet sink helpers stop their query before returning. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          progress.add(e.progress.json)
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      })
    val qs = SparkEntry.queries
    for (name <- args; fn <- qs.get(name)) {
      progress.clear()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(1500)
      println(s"==== $name total ${"%.3f".format(dt)} s ====")
      progress.forEach(p => println(p))
    }
    spark.stop()
  }
}
