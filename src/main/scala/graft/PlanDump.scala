package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence artifact (`plans/rNN/<q>_<tag>.txt`).
  *
  * `SPARK_GRAFT_PLANS_DIR=plans/r17 SPARK_GRAFT_PLANS_TAG=before \
  *    sbt "runMain graft.PlanDump g1_pagerank g2_triangles"`
  *
  * Each file carries the FORMATTED pre-execution plan (PushedFilters /
  * ReadSchema / join strategies visible) plus, after one noop-sink
  * execution, the AQE-final executed plan — both halves the judge's
  * plan-claim checks read. Session confs mirror Bench exactly so the
  * dumped shapes are the benched shapes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r17")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLANS_TAG", "before")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val qs = SparkEntry.queries
    args.filterNot(qs.contains)
      .foreach(n => System.err.println(s"[plandump] unknown query: $n"))
    // The noop write runs its own QueryExecution — the dataset's own
    // queryExecution.executedPlan is never executed, so dumping it
    // labeled "AQE final" produced isFinalPlan=false plans (round-17
    // advisory). Capture the WRITE's QueryExecution from the listener
    // callback instead: after the save returns, its executedPlan's
    // AdaptiveSparkPlan has been re-optimized (isFinalPlan=true).
    @volatile var lastExecuted: Option[String] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        lastExecuted = Some(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    for (name <- args; fn <- qs.get(name)) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val out = new java.io.File(outDir, s"${name}_$tag.txt")
      val w = new java.io.PrintWriter(out, "UTF-8")
      try {
        val df = fn(spark, sfDir)
        w.println(s"==== $name ($tag) — explain formatted (pre-execution) ====")
        w.println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
        lastExecuted = None
        df.write.mode("overwrite").format("noop").save()
        // the listener bus is async; wait briefly for the callback
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        while (lastExecuted.isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        w.println(s"==== $name ($tag) — executed plan (AQE final, from the noop write's QueryExecution) ====")
        w.println(lastExecuted.getOrElse(
          "[plandump] listener produced no executed plan within 15s"))
      } catch { case e: Throwable =>
        w.println(s"[plandump] $name failed: ${e}")
      } finally w.close()
      println(s"[plandump] wrote $out")
    }
    spark.listenerManager.unregister(listener)
    spark.stop()
  }
}
