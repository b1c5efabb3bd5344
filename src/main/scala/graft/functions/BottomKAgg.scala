package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k (hash, value) pairs as a typed Aggregator — the map-side
  * combinable form of the KMV quantile sketch's cut
  * ([[graft.ops.Sketches.kmvSketch]]).
  *
  * Why this exists: the window formulation (`row_number over (group
  * order by h)`) must SHUFFLE every row before it can rank — correct,
  * but the exchange carries the corpus. An aggregate with a bounded
  * buffer cuts to k INSIDE each input partition (partial aggregation),
  * so the exchange carries at most `partitions × groups` buffers of ≤ k
  * pairs — the [[graft.ops.Sketches.hllRegisters]] scale shape, with no
  * prefilter contract needed. Bottom-k is associative and commutative
  * (min-k of a union = min-k of the parts' min-k's), which is exactly
  * the partial/merge split Spark's ObjectHashAggregate executes.
  *
  * Buffer discipline: appends accumulate unsorted and the cut to k
  * runs only when the buffer reaches 2k (amortized O(log k) per row via
  * sort-of-2k); `finish` applies the final exact cut, sorted. Ordering
  * is (h, v) ascending — the window form's ORDER BY, so the two
  * formulations produce the SAME set of rows (KmvSketchSpec pins it).
  */
final class BottomKAgg(k: Int)
    extends Aggregator[BottomKAgg.Pair, BottomKAgg.Buf, BottomKAgg.Buf] {
  require(k >= 1, s"need k ≥ 1, got $k")
  import BottomKAgg.{Buf, Pair}

  private def cut(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
    if (s.length > k) s.sorted.take(k) else s

  override def zero: Buf = Buf(Vector.empty)

  override def reduce(b: Buf, a: Pair): Buf = {
    val grown = b.pairs :+ (a.h -> a.v)
    Buf(if (grown.length >= 2 * k) cut(grown) else grown)
  }

  override def merge(b1: Buf, b2: Buf): Buf = Buf(cut(b1.pairs ++ b2.pairs))

  override def finish(b: Buf): Buf = Buf(cut(b.pairs).sorted)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
}

object BottomKAgg {
  final case class Pair(h: Long, v: Double)
  final case class Buf(pairs: Seq[(Long, Double)])
}
