package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded best-k buffer ordered by (score desc, dst asc) — the exact
  * ordering of the kNN-graph window (`desc(score), asc(dst)`), kept as
  * two parallel arrays with insertion-sort updates. The common case —
  * a row that does not beat the current worst — is ONE comparison; an
  * accepted row pays an O(k) shift. Callers span graph edges (k = 3)
  * and the ANN shortlists (r20: k = R up to ~640 x slow growth with
  * n): on score-unordered input accepted inserts number ~k·ln(n/k),
  * so total shift work is ~k²·ln(n/k) per (group x partition) —
  * ~4M moves at k=640 over millions of candidates, noise next to the
  * scoring itself. Only an ADVERSARIALLY ascending score stream
  * degrades to O(n·k); no caller feeds one (candidates arrive in
  * id/scan order, scores uncorrelated). */
final class TopKEdgesBuffer(val k: Int) extends Serializable {
  val dsts = new Array[Long](k)
  val scores = new Array[Double](k)
  var n = 0

  private def beats(s: Double, d: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && d < dsts(i))

  def insert(d: Long, s: Double): Unit = {
    if (n == k && !beats(s, d, n - 1)) return
    var i = if (n < k) n else k - 1
    while (i > 0 && beats(s, d, i - 1)) {
      dsts(i) = dsts(i - 1); scores(i) = scores(i - 1); i -= 1
    }
    dsts(i) = d; scores(i) = s
    if (n < k) n += 1
  }

  def mergeIn(o: TopKEdgesBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.dsts(i), o.scores(i)); i += 1 }
  }
}

/** Exact top-k aggregate for edge selection: per group, the k best
  * (dst, score) pairs by (score desc, dst asc) — row-identical to
  * `row_number().over(Window.partitionBy(g).orderBy(desc(score),
  * asc(dst))) <= k` but WITHOUT materializing or sorting the
  * candidate set: the partial (map-side) aggregate collapses each
  * partition's pairs into k-entry buffers BEFORE the exchange, so a
  * build that scores n·fan candidate pairs never local-sorts them —
  * the rule-31a disk hazard (an 8.3G-pair WindowGroupLimit sort
  * filled the host disk at the 256k graph rung) is removed
  * structurally, not just budget-bounded. The exchange then carries
  * one <= k-entry buffer per (group x partition) instead of the
  * pruned-but-sorted candidate stream.
  *
  * Emits array<struct<dst, score>> best-first; callers posexplode and
  * take pos+1 as the rank. Null-scored, null-dst and NaN-scored
  * inputs are skipped: nulls never reach the window form either
  * (scores are round() of non-null dots), and NaN is where the two
  * forms would DIVERGE silently — Spark's desc ordering ranks NaN
  * above every double (row_number would keep it first) while this
  * buffer's beats() comparisons all return false for NaN (it would
  * rank worst-possible). Dropping NaN explicitly makes the aggregate
  * and the foil agree BY CONSTRUCTION on any corpus (a zero-norm
  * vector's 0/0 cosine), not by the unit-norm corpus assumption;
  * a neighbor with no defined similarity is not an edge. */
case class TopKEdges(dst: Expression, score: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKEdgesBuffer] {

  require(k >= 1, s"top_k_edges: k must be >= 1, got $k")

  override def prettyName: String = "top_k_edges"
  override def children: Seq[Expression] = Seq(dst, score)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKEdges =
    copy(dst = newChildren(0), score = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("dst", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKEdgesBuffer =
    new TopKEdgesBuffer(k)

  override def update(buf: TopKEdgesBuffer,
                      input: InternalRow): TopKEdgesBuffer = {
    val d = dst.eval(input)
    val s = score.eval(input)
    if (d != null && s != null) {
      val sd = s.asInstanceOf[Double]
      if (!sd.isNaN) buf.insert(d.asInstanceOf[Long], sd)
    }
    buf
  }

  override def merge(buf: TopKEdgesBuffer,
                     other: TopKEdgesBuffer): TopKEdgesBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TopKEdgesBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = InternalRow(buf.dsts(i), buf.scores(i)); i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKEdgesBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putLong(buf.dsts(i)); bb.putDouble(buf.scores(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKEdgesBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKEdgesBuffer(k)
    var i = 0
    // entries arrive best-first (serialize preserves order), so
    // inserts hit the append fast path
    while (i < n) { buf.insert(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKEdges =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKEdges =
    copy(inputAggBufferOffset = o)
}
