package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** GROUPED TOP-K — the aggregator Spark itself lacks. The built-in way
  * to rank within groups (`row_number().over(Window.partitionBy(g))`)
  * must shuffle EVERY candidate row to its group's reducer before it can
  * rank anything: at 100 TB that is an exchange proportional to the full
  * candidate set. An Aggregator with a bounded (score, id) buffer gets
  * map-side combine from Spark's agg machinery for free, so each
  * partition sends at most k rows PER GROUP — the same
  * partial-heads-then-merge shape `TakeOrderedAndProject` applies
  * globally (W2), lifted to per-group semantics.
  *
  * Total order (score DESC, id ASC) — ties are broken by id, so the
  * result is independent of row order and partitioning: deterministic
  * enough to sit under a hash oracle (q93).
  */
class TopKByScore(k: Int) extends Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]]
    with Serializable {
  require(k > 0, "k must be positive")

  /** better(a, b): a strictly precedes b in (score DESC, id ASC). */
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: List[(Long, Long)] = Nil

  override def reduce(b: List[(Long, Long)], v: (Long, Long)): List[(Long, Long)] =
    insert(b, v, 0)

  // ordered insert, dropping past k — O(k) per row, k is small by contract
  private def insert(b: List[(Long, Long)], v: (Long, Long), depth: Int): List[(Long, Long)] =
    b match {
      case _ if depth >= k => Nil
      case Nil => v :: Nil
      case h :: t =>
        if (better(v, h)) (v :: b).take(k - depth)
        else h :: insert(t, v, depth + 1)
    }

  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
    b.foldLeft(a)((acc, v) => insert(acc, v, 0))

  override def finish(b: List[(Long, Long)]): Seq[(Long, Long)] = b

  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    ExpressionEncoder[List[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopKByScore {
  /** Column form: `top_k((score, id))` → `array<struct<_1 score, _2 id>>`
    * ordered (score DESC, id ASC). Pair the call with `posexplode` for a
    * 1-based rank. */
  def apply(score: Column, id: Column, k: Int): Column =
    udaf(new TopKByScore(k)).apply(score, id) // tuple IN ⇒ one arg per field
}
