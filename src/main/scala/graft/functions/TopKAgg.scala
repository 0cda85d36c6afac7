package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the per-group top-k (score, id) pairs
  * with a bounded buffer — the UDAF surface of the library, and the
  * SCALABLE alternative to `row_number().over(window) <= k` when k is
  * small: the window formulation shuffles and sorts every row of each
  * group, while this aggregator's partial buffers carry at most k
  * elements per group per map task, so the shuffle volume is
  * O(groups × k), independent of group size.
  *
  * Determinism: ordering is (score DESC, id ASC) — ties keep the
  * lowest id, and `merge` is associative/commutative over that total
  * order, so results are partitioning-independent (required for an
  * exact oracle).
  *
  * The buffer is a sorted List (insertion into ≤ k elements) — for
  * the small k this targets (top-3/top-10/top-100) that beats heap
  * bookkeeping and keeps the Encoder trivial.
  *
  * `distinct = true` collapses EXACT duplicate (score, id) pairs —
  * the multi-table LSH candidate stream surfaces the same neighbor
  * from several tables/probes with bit-identical scores, and a
  * bounded buffer must drop the copies or a duplicated pair would
  * crowd a distinct neighbor out of the top-k. Equality is
  * canonical-score (Double.compare == 0) + id — NaN-reflexive,
  * unlike IEEE `==` — and the skip keeps `merge`
  * associative/commutative over the same total order. */
class TopKAgg(k: Int, distinct: Boolean = false)
    extends Aggregator[(Double, Long), List[(Double, Long)],
      Seq[(Double, Long)]] {

  // Score order via java.lang.Double.compare, NOT primitive >/==:
  // NaN compares false to everything under IEEE operators, so a NaN
  // score (e.g. cosine of a zero-norm vector) would make insertion
  // position arrival-order-dependent and merge lose associativity —
  // the window formulation this replaces used Spark's NaN-greatest
  // total order, and compare preserves that (NaN sorts above +Inf,
  // identical NaNs tie and fall through to the id tiebreak).
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  // Duplicate test for `distinct` mode — canonical-score equality
  // (compare == 0), not tuple `==`: Scala's `==` on Double is IEEE
  // (NaN != NaN), so a duplicated NaN-scored pair would never
  // collapse and could crowd a distinct neighbor out of the top-k,
  // the exact failure distinct mode exists to prevent.
  private def dup(a: (Double, Long), b: (Double, Long)): Boolean =
    java.lang.Double.compare(a._1, b._1) == 0 && a._2 == b._2

  private def insert(buf: List[(Double, Long)],
      x: (Double, Long)): List[(Double, Long)] = {
    val (ahead, behind) = buf.span(better(_, x))
    if (distinct && behind.headOption.exists(dup(_, x))) buf
    else {
      val merged = ahead ::: x :: behind
      if (merged.length > k) merged.init else merged
    }
  }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)],
      in: (Double, Long)): List[(Double, Long)] =
    if (buf.length == k && better(buf.last, in)) buf else insert(buf, in)

  override def merge(a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
