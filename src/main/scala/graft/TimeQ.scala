package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing at bench settings (local[32], AQE on):
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.TimeQ h3_top_orders ..."`
  * Prints warmup + 3 measured runs per query.
  *
  * This is the ADJUDICATION tool for disputed bench artifact numbers
  * (README "Disputing a bench number"; both judge rounds used it): a
  * fresh JVM, free of suite position and cache residue, measuring the
  * SAME thing `Bench.runOnce` measures — cache/unpersist hygiene
  * untimed, then the plan materialized through the noop sink (not
  * collect(): pair-list queries' true output grows with the corpus
  * and a driver fetch would measure the wrong thing, or OOM). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", (128L << 20).toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    args.filterNot(qs.contains)
      .foreach(n => System.err.println(s"[timeq] unknown query: $n"))
    for (name <- args; fn <- qs.get(name)) {
      val times = (0 to 3).map { i =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"TIME $name run$i $dt%.3f s")
        dt
      }
      println(f"TIME $name best ${times.tail.min}%.3f s")
    }
    spark.stop()
  }
}
