package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. RANDOM'02;
  * the theta-sketch ancestor) as a typed `Aggregator` — the SURVEY §2.9
  * UDAF surface exercised with a REAL mergeable sketch rather than a
  * toy. The buffer is the sorted array of the k smallest DISTINCT
  * hash values seen; `merge` is the min-k of the union, which makes the
  * sketch associative and map-side combinable — the same 100 TB
  * mergeability argument as HLL (q171), but PORTABLE: built on the
  * engine-portable 60-bit md5 hash, the k-th minimum (and therefore the
  * estimate (k-1)·2^60/h_k) replays EXACTLY in DuckDB, so unlike HLL
  * the estimate itself hash-compares across engines.
  *
  * Reference analog: APPROX_COUNT_DISTINCT's HLL
  * (`QueryEngine/HyperLogLog.h:88` in /root/reference) — same contract,
  * deterministic cross-engine value.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    insert(buf, h)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Long]): Array[Long] = buf

  /** Sorted-insert keeping only the k smallest distinct values. O(k)
    * worst case, O(log k) when h exceeds the current maximum (the
    * overwhelmingly common case once the buffer fills).
    */
  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) buf // distinct sketch: duplicates are no-ops
    else {
      val ins = -idx - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins >= k) buf
      else {
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      }
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
