package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      (0 to 2).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"PROBE $name run$i ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
    }
    val l = Tables.lineitem(spark, d)
    time("count")(l.count())
    time("scan_all_cols")(l.agg(count(lit(1))).collect())
    time("rev_agg") {
      l.groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue")).count()
    }
    time("rev_agg_top10") {
      l.groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc).limit(10).collect()
    }
    spark.stop()
  }
}
