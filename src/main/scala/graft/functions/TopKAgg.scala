package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One retained hit: `score` ranks desc, `id` breaks ties asc. */
case class TopHit(score: Double, id: Long)

/** Bounded-heap top-k as a MERGEABLE typed aggregate — the
  * map-side-combine shape for distributed top-k-per-group: each
  * partition reduces its rows into at most `k` retained hits, partial
  * buffers merge pairwise, and only O(groups × k) state ever crosses
  * the wire or sits in a state store. This is what makes per-group
  * ranking legal inside a STREAMING aggregation (Structured Streaming
  * forbids rank/row_number over a stream but runs declarative/typed
  * aggregates incrementally), and at batch scale it replaces a
  * sort-the-world window with a single combine-friendly pass.
  *
  * Ordering is total and deterministic: score desc, then id asc — the
  * same (cosine DESC, vec_id ASC) contract every batch top-k in
  * `graft.ops.Similarity` uses. Duplicate ids fold together keeping
  * their best score (an ANN candidate can meet a query in several
  * probed cells), so the output never ranks one neighbor twice.
  *
  * Buffer is a plain sorted array: insertion cost O(k) per row with
  * k ≤ a few hundred — cheaper than heap bookkeeping at these sizes
  * and trivially mergeable.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Array[TopHit], Array[TopHit]] {
  require(k > 0, "top-k needs k > 0")

  // Double.compare ordering, NOT IEEE >/==: insert must agree with the
  // sort comparator `ord` on NaN (a zero-norm vector yields cosine
  // 0/0 = NaN), else output becomes arrival-order-dependent. Under
  // Double.compare, NaN is the largest double — it ranks first AND can
  // displace, consistently, instead of ranking first only when it
  // arrived while the buffer was under capacity.
  private def better(aS: Double, aI: Long, bS: Double, bI: Long): Boolean = {
    val c = java.lang.Double.compare(aS, bS)
    c > 0 || (c == 0 && aI < bI)
  }

  /** Insert (score, id) into sorted-desc `b`, dedup by id, cap at k. */
  private def insert(b: Array[TopHit], score: Double,
                     id: Long): Array[TopHit] = {
    var i = 0
    while (i < b.length) { // fold duplicate id onto its best score
      if (b(i).id == id) {
        if (better(score, id, b(i).score, id)) {
          val out = new Array[TopHit](b.length)
          System.arraycopy(b, 0, out, 0, b.length)
          out(i) = TopHit(score, id)
          java.util.Arrays.sort(out, ord)
          return out
        }
        return b
      }
      i += 1
    }
    if (b.length < k) {
      val out = new Array[TopHit](b.length + 1)
      System.arraycopy(b, 0, out, 0, b.length)
      out(b.length) = TopHit(score, id)
      java.util.Arrays.sort(out, ord)
      out
    } else if (better(score, id, b(k - 1).score, b(k - 1).id)) {
      val out = new Array[TopHit](k)
      System.arraycopy(b, 0, out, 0, k)
      out(k - 1) = TopHit(score, id)
      java.util.Arrays.sort(out, ord)
      out
    } else b
  }

  private val ord: java.util.Comparator[TopHit] =
    new java.util.Comparator[TopHit] with Serializable {
      def compare(a: TopHit, b: TopHit): Int = {
        val c = java.lang.Double.compare(b.score, a.score)
        if (c != 0) c else java.lang.Long.compare(a.id, b.id)
      }
    }

  override def zero: Array[TopHit] = Array.empty
  override def reduce(b: Array[TopHit], x: (Double, Long)): Array[TopHit] =
    insert(b, x._1, x._2)
  override def merge(a: Array[TopHit], b: Array[TopHit]): Array[TopHit] = {
    var out = a
    var i = 0
    while (i < b.length) { out = insert(out, b(i).score, b(i).id); i += 1 }
    out
  }
  override def finish(r: Array[TopHit]): Array[TopHit] = r
  override def bufferEncoder: Encoder[Array[TopHit]] =
    ExpressionEncoder[Array[TopHit]]()
  override def outputEncoder: Encoder[Array[TopHit]] =
    ExpressionEncoder[Array[TopHit]]()
}
