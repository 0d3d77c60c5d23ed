package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed `Aggregator` with map-side partial aggregation:
  * each partition keeps only its k best (score, id) pairs, partials merge
  * pairwise, so per-group traffic is O(k) instead of O(rows) — the scale
  * replacement for `row_number()` windows (which need a full sort per
  * partition key) in the similarity top-k operators.
  *
  * Ordering: score DESC, id ASC (id is the deterministic tiebreaker).
  */
object TopKAggregator {

  final case class Scored(score: Double, id: Long)

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  final class TopK(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    override def zero: List[Scored] = Nil

    // keep the buffer sorted best-first, bounded at k
    override def reduce(buf: List[Scored], x: Scored): List[Scored] = insert(buf, x)

    override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      b.foldLeft(a)(insert)

    private def insert(buf: List[Scored], x: Scored): List[Scored] = {
      if (buf.sizeIs >= k && better(buf.last, x)) buf
      else {
        val (front, back) = buf.span(better(_, x))
        (front ::: x :: back).take(k)
      }
    }

    override def finish(r: List[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Untyped column form: `topK(k)(struct(score, id))` usable in
    * `groupBy.agg`. Returns array<struct<score,id>> sorted best-first. */
  def topK(k: Int): (Column, Column) => Column = {
    val agg = udaf(new TopK(k), Encoders.product[Scored])
    (score: Column, id: Column) => agg(score, id)
  }
}
