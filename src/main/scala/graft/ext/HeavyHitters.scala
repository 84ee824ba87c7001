package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` (the engine's
  * one custom UDAF — SURVEY.md §2.6): bounded-memory frequent-item
  * estimation with the classic guarantee that any item with true
  * frequency > n/capacity survives, and estimates undercount by at most
  * n/capacity. Mergeable (the buffer union is pruned back to capacity),
  * so it composes with partial aggregation.
  *
  * Exact-top-k queries in the suite use window functions (oracle-able);
  * this is the bounded-memory alternative for cardinalities where an
  * exact group-by would not fit — the 100 TB corpus-vocabulary case.
  */
class HeavyHitters(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity > 0)

  override def zero: Map[String, Long] = Map.empty

  private def prune(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      // Misra-Gries: subtract the (capacity+1)-th largest count, so at
      // most `capacity` positive entries survive in ONE pass (a plain
      // decrement-by-min would leave up to 2x capacity after a merge of
      // two full buffers)
      val dec = m.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      m.flatMap { case (k, v) =>
        if (v - dec > 0) Some(k -> (v - dec)) else None
      }
    }

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    prune(b.updated(a, b.getOrElse(a, 0L) + 1L))

  override def merge(
      x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
    prune(y.foldLeft(x) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    })

  override def finish(b: Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (k, v) => (-v, k) }

  // real Catalyst encoders (MAP / ARRAY<STRUCT>), not kryo blobs: the
  // result column stays queryable SQL data (explodable, sinkable to a
  // memory table) instead of opaque BINARY
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
