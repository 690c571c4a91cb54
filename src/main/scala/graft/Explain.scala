package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more
  * [[SparkEntry.queries]] without executing them —
  * `runMain graft.Explain <sfDir> <query...>`. Used to keep every
  * operator's plan honest (pushdown reaching the scan, broadcasts
  * where intended, no accidental exchanges) as the suite grows.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
