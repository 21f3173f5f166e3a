package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded smallest-k aggregate over longs: collects the k smallest
  * distinct values of a group into a sorted array with O(k) state.
  *
  * The built-in alternative (`slice(sort_array(collect_set(x)), 1, k)`)
  * materializes the WHOLE group in the aggregation buffer before
  * truncating — on a 100 TB corpus a high-frequency key would collect
  * millions of values to keep 20. This aggregator never holds more than
  * k values per buffer, partial-merges map-side like any typed
  * Aggregator, and ships at most k longs per group through the shuffle.
  */
class BoundedSmallestK(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  // buffer: sorted ascending, distinct, length <= k
  override def zero: Array[Long] = Array.emptyLongArray

  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) buf // duplicate
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than the k-th smallest
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def reduce(buf: Array[Long], v: Long): Array[Long] = insert(buf, v)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var out = a
    var i = 0
    while (i < b.length) { out = insert(out, b(i)); i += 1 }
    out
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BoundedTopK {
  /** Column form: sorted array of the k smallest distinct values. */
  def smallestK(c: Column, k: Int): Column = udaf(new BoundedSmallestK(k)).apply(c)
}
