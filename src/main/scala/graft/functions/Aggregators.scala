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
}
