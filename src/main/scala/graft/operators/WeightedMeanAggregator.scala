package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF #2 (SURVEY §2.8): EXACT weighted mean over integer
  * (value, weight) pairs — the quality-weighted average of a curation
  * pipeline (token-weighted quality scores, trust-weighted source stats)
  * kept entirely in integer arithmetic: the buffer is the pair of exact
  * sums (Σwx, Σw), merge is addition, and the mean is only materialized
  * at `finish` as a truncating integer division in ppm units. Exact
  * integer sums are combine-order-free, so the aggregate is independent
  * of partitioning — replayable hash-exactly by a SQL oracle, unlike a
  * running double mean.
  *
  * Scale note: constant state per group (two longs) — safe under any
  * group cardinality; the untyped twin is one `sum`/`sum` + division,
  * which stays the default outside typed `Dataset` land. */
object WeightedMeanAggregator {

  /** (Σwx, Σw, mean in ppm = (10^6 · Σwx) div Σw; 0-weight groups report
    * (0, 0, 0)). */
  val weightedMean: Aggregator[(Long, Long), (Long, Long), (Long, Long, Long)] =
    new Aggregator[(Long, Long), (Long, Long), (Long, Long, Long)] {
      def zero: (Long, Long) = (0L, 0L)
      def reduce(b: (Long, Long), vw: (Long, Long)): (Long, Long) =
        (b._1 + vw._1 * vw._2, b._2 + vw._2)
      def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Long, Long)): (Long, Long, Long) =
        if (b._2 == 0L) (0L, 0L, 0L)
        // BigInt: the 10^6 scale-up overflows a long past Σwx ~9·10^12.
        // TRUNCATING division (BigInt `/` rounds toward zero) is the
        // cross-engine convention: both Spark's `div` and DuckDB's `//`
        // truncate on negatives (verified: -7 // 2 = -3 in DuckDB), so
        // the ppm hash-matches the oracle for negative sums too
        else (b._1, b._2, (BigInt(b._1) * 1000000 / b._2).toLong)
      def bufferEncoder: Encoder[(Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      def outputEncoder: Encoder[(Long, Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong)
    }
}
