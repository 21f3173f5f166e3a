package graft.dedup

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate: element-wise minimum over minhash signatures — the
  * set-union property of minhash (sig(A ∪ B) = elementwise-min(sig(A),
  * sig(B))) lets a GROUP of documents carry one corpus-level signature.
  *
  * Used to sketch whole groups (a source, a crawl, a dedup cluster) so
  * group-vs-group similarity is O(k) instead of O(docs²). Runs as a
  * standard two-phase aggregate: partial element-wise mins map-side,
  * merge in the reduce — shuffle carries k longs per group total.
  */
class MinHashAggregator(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null && sig.length == k) {
      var i = 0
      while (i < k) {
        val v = sig(i)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] =
    if (buf.forall(_ == Long.MaxValue)) null else buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
