package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed merge-by-primary-key fold (ref: pkg/loader/merge.go:21-141).
  *
  * The reference algebra over a key's ordered op sequence:
  *   I + U → I(new image)   I + D → D     U + U → U (oldest pre-image kept)
  *   U + D → D              D + I → I     D + D → D (idempotent replay)
  * and an update that changes the primary key is split into
  * D(old key) + I(new key) *before* folding (merge.go:48-77).
  *
  * [[Cdc.compactByPk]] is the window-function twin used by the batch
  * harness; this Aggregator is the order-robust form usable with
  * `groupByKey(...).agg(MergeAlgebra.compact.toColumn)` in both batch and
  * streaming (update mode) — it tolerates out-of-order arrival by tracking
  * (firstTs, lastTs) instead of assuming sorted input, so shuffled
  * partitions and late events fold to the same result.
  */
object MergeAlgebra {

  /** One change event; `newPk` differs from `pk` on a key-changing update. */
  case class Change(commitTs: Long, pk: Long, newPk: Long, op: String, value: Double)

  /** Split key-changing updates into D(old)+I(new) (merge.go:48-77). The
    * split halves keep the originating commitTs so ordering is preserved. */
  def splitPkChange(c: Change): Seq[Change] =
    if (c.op == "U" && c.newPk != c.pk)
      Seq(c.copy(op = "D", newPk = c.pk, value = 0.0),
          c.copy(op = "I", pk = c.newPk))
    else Seq(c)

  /** Fold state: ops and image at the earliest and latest commitTs seen. */
  case class State(firstTs: Long, firstOp: String, firstValue: Double,
                   lastTs: Long, lastOp: String, lastValue: Double, n: Long)

  case class Compacted(commitTs: Long, op: String, value: Double,
                       oldValue: Double, nFolded: Long)

  val compact: Aggregator[Change, State, Compacted] =
    new Aggregator[Change, State, Compacted] {
      def zero: State = State(Long.MaxValue, "", 0.0, Long.MinValue, "", 0.0, 0L)

      /** Strict total order on (commitTs, op, value). Ties at one commitTs
        * — an at-least-once redelivery of the same event, or an upstream
        * emitting two ops at one ts — previously folded to a
        * PARTITIONING-DEPENDENT result: `reduce` kept the incumbent on a
        * tie (strict <,>) while `merge` preferred side a (<=, >=), so the
        * winner depended on shuffle order. The lexicographic tie-break is
        * arbitrary but STABLE: identical inputs fold identically on any
        * partitioning, which is the Aggregator's whole contract. */
      private def lt(ts1: Long, op1: String, v1: Double,
          ts2: Long, op2: String, v2: Double): Boolean =
        ts1 < ts2 || (ts1 == ts2 && (op1 < op2 || (op1 == op2 && v1 < v2)))

      def reduce(s: State, c: Change): State = {
        var r = s
        if (r.n == 0 || lt(c.commitTs, c.op, c.value, r.firstTs, r.firstOp, r.firstValue))
          r = r.copy(firstTs = c.commitTs, firstOp = c.op, firstValue = c.value)
        if (r.n == 0 || lt(r.lastTs, r.lastOp, r.lastValue, c.commitTs, c.op, c.value))
          r = r.copy(lastTs = c.commitTs, lastOp = c.op, lastValue = c.value)
        r.copy(n = r.n + 1)
      }

      def merge(a: State, b: State): State = {
        if (a.n == 0) b
        else if (b.n == 0) a
        else {
          val (ft, fo, fv) =
            if (lt(b.firstTs, b.firstOp, b.firstValue, a.firstTs, a.firstOp, a.firstValue))
              (b.firstTs, b.firstOp, b.firstValue)
            else (a.firstTs, a.firstOp, a.firstValue)
          val (zt, zo, zv) =
            if (lt(a.lastTs, a.lastOp, a.lastValue, b.lastTs, b.lastOp, b.lastValue))
              (b.lastTs, b.lastOp, b.lastValue)
            else (a.lastTs, a.lastOp, a.lastValue)
          State(ft, fo, fv, zt, zo, zv, a.n + b.n)
        }
      }

      def finish(s: State): Compacted = {
        // associative op-type algebra: the net effect is a function of the
        // first and last ops alone (intermediate ops cancel pairwise).
        val op =
          if (s.lastOp == "D") "D"
          else if (s.firstOp == "U") "U"
          else "I" // first I or D with a surviving last image
        Compacted(s.lastTs, op, s.lastValue, s.firstValue, s.n)
      }

      def bufferEncoder: Encoder[State] = Encoders.product[State]
      def outputEncoder: Encoder[Compacted] = Encoders.product[Compacted]
    }

  /** Reference-semantics brute force for tests: replay the full sequence in
    * commitTs order against a key→value map and report the net op. Sorted
    * by the same (commitTs, op, value) total order the Aggregator's
    * tie-break uses, so the two agree under duplicate timestamps too. */
  def bruteForce(changes: Seq[Change]): Map[Long, (String, Double)] = {
    val sorted = changes.flatMap(splitPkChange)
      .sortBy(c => (c.commitTs, c.op, c.value))
    sorted.groupBy(_.pk).map { case (pk, cs) =>
      val first = cs.head
      val last = cs.last
      val op =
        if (last.op == "D") "D"
        else if (first.op == "U") "U"
        else "I"
      pk -> ((op, last.value))
    }
  }
}
