package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing at bench settings (local[32], AQE on):
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.TimeQ h3_top_orders ..."`
  * Prints warmup + 3 measured runs per query. */
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
        val t0 = System.nanoTime()
        fn(spark, sfDir).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"TIME $name run$i $dt%.3f s")
        dt
      }
      println(f"TIME $name best ${times.tail.min}%.3f s")
    }
    spark.stop()
  }
}
