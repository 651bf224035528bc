package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Input row for the bounded top-k aggregate: metric + the two
  * tie-break keys (orderkey, linenumber) that make ranking total.
  */
case class TopIn(m: Long, o: Long, l: Long)

/** Grouped exact top-k as a typed `Aggregator` with a BOUNDED buffer —
  * the scale replacement for `row_number() OVER (PARTITION BY g ORDER
  * BY m DESC) <= k`. The window form sorts every group's full row set
  * through the shuffle; this aggregator keeps only k rows per partial,
  * so the map side combines before shuffling and the exchange carries
  * <= k rows per (group, partition) instead of the whole fact table —
  * the reference gets the same effect from its topk path
  * (`QueryEngine/TopKSort.cu` on GPU). Ordering is total via
  * (m DESC, o ASC, l ASC), so the result is deterministic and replays
  * in any engine.
  */
class TopKAgg(k: Int) extends Aggregator[TopIn,
    Array[(Long, Long, Long)], Array[(Long, Long, Long)]] {

  private type E = (Long, Long, Long)

  /** true iff a ranks strictly better than b. */
  private def better(a: E, b: E): Boolean =
    a._1 > b._1 || (a._1 == b._1 &&
      (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))

  override def zero: Array[E] = Array.empty

  override def reduce(buf: Array[E], in: TopIn): Array[E] =
    insert(buf, (in.m, in.o, in.l))

  override def merge(a: Array[E], b: Array[E]): Array[E] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[E]): Array[E] = buf

  /** Keep the buffer sorted best-first, capped at k. O(k) per insert —
    * k is small by contract (top-k, not top-million).
    */
  private def insert(buf: Array[E], e: E): Array[E] = {
    val pos = buf.indexWhere(x => better(e, x)) match {
      case -1 => buf.length
      case i  => i
    }
    if (pos >= k) buf
    else (buf.take(pos) :+ e) ++ buf.drop(pos).take(k - pos - 1)
  }

  override def bufferEncoder: Encoder[Array[E]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[E]] = ExpressionEncoder()
}
