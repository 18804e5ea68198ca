package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (`Aggregator[IN,BUF,OUT]`) — the engine's
  * first-class version of the reference's user-defined reduce fold.
  */
object Aggregators {

  /** Dot-product aggregator: per group, `Σ a·b`.
    *
    * This is the reference's reducer (`program.c:424-436`: walk the
    * value list pairing `(A,j,a)` with `(B,j,b)`, `sum += num1*num2`)
    * made first-class and order-independent — the reference's fold only
    * works because A/B values happen to alternate in shuffle order
    * (SURVEY.md §2.1 bug list); here each input row already carries both
    * factors (the join did the pairing), so the fold is a plain
    * commutative sum: partial (map-side) aggregation applies and shuffle
    * order is irrelevant — the properties a 100 TB aggregation needs.
    *
    * Registered via `functions.udaf(DotProductAgg)` it is usable as an
    * untyped SQL aggregate `dot_product(a, b)`.
    */
  object DotProductAgg extends Aggregator[(Long, Long), Long, Long] {
    override def zero: Long = 0L
    // addExact/multiplyExact: fail loudly on overflow like the
    // declarative ANSI-mode sum path, instead of wrapping silently.
    override def reduce(acc: Long, in: (Long, Long)): Long =
      Math.addExact(acc, Math.multiplyExact(in._1, in._2))
    override def merge(a: Long, b: Long): Long = Math.addExact(a, b)
    override def finish(acc: Long): Long = acc
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Misra–Gries heavy-hitter summary: a k-counter mergeable sketch
    * whose candidate set provably contains every item with frequency
    * > N/(k+1) under ANY merge tree (Misra & Gries 1982; merge rule —
    * add counters, then subtract the (k+1)-th largest value and drop
    * non-positives — per Agarwal et al., "Mergeable Summaries",
    * PODS'12). The candidates are NOT exact counts and DO depend on
    * partitioning; the deterministic contract is one-sided: no true
    * heavy hitter is ever missing. q290 exploits exactly that — sketch
    * pass for candidates (map-side ≤k-entry summaries, no vocab-wide
    * shuffle), then an exact candidate-filtered count pass whose
    * HAVING cnt·k > N filter makes the OUTPUT exact and
    * partitioning-independent.
    */
  class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Array[String]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      b.get(tok) match {
        case Some(c) => b.updated(tok, c + 1L)
        case None if b.size < k => b.updated(tok, 1L)
        // full and absent: decrement every counter (amortized O(1) per
        // stream element — each decrement retires k+1 count units)
        case None => b.flatMap { case (t, c) =>
          if (c > 1L) Some(t -> (c - 1L)) else None }
      }
    override def merge(a: Map[String, Long],
        b: Map[String, Long]): Map[String, Long] = {
      val m = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c) }
      if (m.size <= k) m
      else {
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        m.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
      }
    }
    override def finish(b: Map[String, Long]): Array[String] =
      b.keys.toArray.sorted
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
