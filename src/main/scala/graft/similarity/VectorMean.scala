package graft.similarity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY.md §2.10 "custom aggregate"
  * extension point): element-wise mean of an `array<double>` column —
  * the centroid-update step of k-means, used to TRAIN the IVF index's
  * cells instead of sampling them.
  *
  * Why an `Aggregator`: the buffer (running sum vector + count) merges
  * associatively, so Spark combines map-side partials per partition
  * and shuffles one buffer per (group x partition) — the corpus's
  * vectors never shuffle. That is the same partial-aggregation shape
  * every built-in SUM gets, applied to a vector payload the built-ins
  * don't cover.
  *
  * Note: float summation order varies with partitioning, so means are
  * reproducible only to float tolerance — fine for index training
  * (verified by spec, not by the bit-exact oracle gate).
  */
object VectorMean extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Double]): (Array[Double], Long) = {
    if (a == null) return b
    if (b._2 == 0L) (a.clone(), 1L)
    else {
      val s = b._1
      // ragged input is a data error — summing a prefix and still
      // counting the row would silently bias the mean
      require(a.length == s.length,
        s"vector_mean: dimension mismatch (${a.length} vs ${s.length})")
      var i = 0
      while (i < s.length) { s(i) += a(i); i += 1 }
      (s, b._2 + 1L)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._2 == 0L) y
    else if (y._2 == 0L) x
    else {
      val s = x._1
      require(y._1.length == s.length,
        s"vector_mean: dimension mismatch (${y._1.length} vs ${s.length})")
      var i = 0
      while (i < s.length) { s(i) += y._1(i); i += 1 }
      (s, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Array[Double] =
    if (b._2 == 0L) Array.emptyDoubleArray else b._1.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
