package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fellegi–Sunter-style record linkage (Fellegi & Sunter, "A Theory
  * for Record Linkage", JASA 1969): candidate pairs from cheap
  * BLOCKING keys, then a weighted sum of per-field agreement tests;
  * pairs above a threshold are link candidates. The structure —
  * block, compare fields, sum integer weights — is what entity
  * resolution at corpus scale actually runs; the probabilistic m/u
  * weights reduce to fixed integers once estimated.
  *
  * Scale posture: the self-join shuffles on the block key ONLY
  * (records never all-pair); `maxBlockSize` is the standard skew
  * guard — a degenerate block (one giant city, one default phone
  * prefix) would go quadratic inside itself, so oversized blocks are
  * dropped before the join, riding the same shuffle the join needs
  * (the [[Dedup]] LSH-bucket cap, same trade). Weights are integers,
  * so scores are engine-exact under any evaluation order.
  */
object Linkage {

  /** One agreement test: (name, test on (left, right) columns of the
    * same field, weight added when the test passes). */
  final case class Agreement(field: String,
      test: (Column, Column) => Column, weight: Int)

  /** Score blocked candidate pairs; keep those at or above
    * `threshold`. Output: (a, b, score), a < b by id. */
  def linkagePairs(records: DataFrame, idCol: String,
      blockCols: Seq[String], agreements: Seq[Agreement],
      threshold: Int, maxBlockSize: Option[Int] = None): DataFrame = {
    val capped = maxBlockSize match {
      case None => records
      case Some(cap) =>
        val w = Window.partitionBy(blockCols.map(col): _*)
        records.withColumn("__bn", count(lit(1)).over(w))
          .filter(col("__bn") <= cap).drop("__bn")
    }
    val x = capped.as("x")
    val y = capped.as("y")
    val blockEq = blockCols.map(c => col(s"x.$c") === col(s"y.$c"))
      .reduce(_ && _)
    val score = agreements.map { a =>
      when(a.test(col(s"x.${a.field}"), col(s"y.${a.field}")),
        lit(a.weight)).otherwise(lit(0))
    }.reduce(_ + _)
    x.join(y, blockEq && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"),
        score.cast("int").as("score"))
      .filter(col("score") >= threshold)
  }
}
