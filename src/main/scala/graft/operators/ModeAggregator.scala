package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-UDAF twin of [[GroupedMode]] (SURVEY §2.8): a mode-by
  * `Aggregator[(value), Map[value, count], (value, count)]` usable with
  * `KeyValueGroupedDataset.agg`. Same semantics as the window formulation —
  * max count, ties to the smallest value — so the two are interchangeable
  * and cross-pinned by test.
  *
  * Scale note: the window formulation (`GroupedMode.modeBy`) is the default
  * at corpus scale — its pre-aggregation collapses the vote stream
  * map-side and its state per group is one row. This Aggregator holds a
  * value→count map per group, which is fine when the per-group candidate
  * cardinality is bounded (the customs use case: a handful of official
  * descriptions per source phrase) and wins when callers are already in
  * typed `Dataset` land. */
object ModeAggregator {

  /** Mode of a string value with deterministic tie-break (smallest value).
    * Returns (winner, frequency). */
  val stringMode: Aggregator[String, Map[String, Long], (String, Long)] =
    new Aggregator[String, Map[String, Long], (String, Long)] {
      def zero: Map[String, Long] = Map.empty
      def reduce(m: Map[String, Long], v: String): Map[String, Long] =
        m.updated(v, m.getOrElse(v, 0L) + 1L)
      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
        b.foldLeft(a) { case (m, (v, c)) => m.updated(v, m.getOrElse(v, 0L) + c) }
      def finish(m: Map[String, Long]): (String, Long) =
        if (m.isEmpty) (null, 0L)
        else m.minBy { case (v, c) => (-c, v) } // max count, ties -> smallest value
      def bufferEncoder: Encoder[Map[String, Long]] =
        Encoders.kryo[Map[String, Long]]
      def outputEncoder: Encoder[(String, Long)] =
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    }
}
