package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-m aggregate: `bounded_top_m(score, id, m)` keeps the m
  * best `(score, id)` pairs per group — best = highest score, ties broken
  * by lowest id — and returns them best-first as
  * `array<struct<score:double, id:bigint>>`.
  *
  * Why this exists (the l48 scale fix): a per-group top-m written as
  * `row_number().over(Window.partitionBy(g))` shuffles EVERY input row
  * onto |groups| keys — when each group receives the whole corpus (the
  * query-broadcast coarse-scoring shape), each reducer sorts N rows in one
  * task: a guaranteed straggler no AQE skew split can fix, because it is
  * one key, not a skewed distribution. As a TypedImperativeAggregate the
  * same computation runs through ObjectHashAggregate with map-side partial
  * aggregation: each map task folds its slice into a ≤m-entry heap per
  * group, the exchange carries |groups|·P serialized heaps (≤m entries
  * each) instead of |groups|·N rows, and the final merge per group touches
  * P·m entries. Memory is bounded at m entries per in-flight group by
  * construction — there is no collect_list-style unbounded buffer.
  *
  * Determinism: selection and output order are total — (score desc,
  * id asc) — so results are independent of partition layout and merge
  * order, and a DuckDB `row_number() over (order by score desc, id)`
  * oracle reproduces them exactly (the aggregate only SELECTS rows; it
  * never recomputes scores).
  *
  * Null semantics: rows with a null score or null id are ignored (the
  * window formulation would rank nulls somewhere engine-specific; a null
  * score is a non-candidate here). An empty group yields an empty array.
  *
  * `m` must be a positive foldable integer — it sizes the heap and is the
  * contract the memory bound rests on. Reference analog: none —
  * beyond-reference LLM plane (SURVEY §2.7), motivated by L48.
  */
case class BoundedTopM(
    score: Expression,
    id: Expression,
    mExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedTopM.Heap] {

  private lazy val m: Int = mExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => throw new IllegalArgumentException(
      s"bounded_top_m: m must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(score, id, mExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BoundedTopM.resultType
  override def prettyName: String = "bounded_top_m"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"bounded_top_m: score must be double, got ${score.dataType}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bounded_top_m: id must be bigint, got ${id.dataType}")
    else if (!mExpr.foldable || !(mExpr.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        "bounded_top_m: m must be a foldable integer")
    else if (m <= 0)
      TypeCheckResult.TypeCheckFailure(s"bounded_top_m: m must be > 0, got $m")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BoundedTopM.Heap =
    new BoundedTopM.Heap(m)

  override def update(buf: BoundedTopM.Heap, input: InternalRow): BoundedTopM.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedTopM.Heap, other: BoundedTopM.Heap): BoundedTopM.Heap = {
    var i = 0
    while (i < other.size) {
      buf.offer(other.scores(i), other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: BoundedTopM.Heap): Any = {
    val pairs = buf.sortedBestFirst()
    new GenericArrayData(pairs.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buf: BoundedTopM.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i))
      bb.putLong(buf.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopM.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = new BoundedTopM.Heap(m)
    var i = 0
    while (i < n) {
      // serialized entries already satisfy the heap invariant in array
      // order (they ARE the heap array), but re-offering keeps this
      // correct even if m differs between plan instances
      heap.offer(bb.getDouble, bb.getLong)
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopM =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopM =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopM =
    copy(score = newChildren(0), id = newChildren(1), mExpr = newChildren(2))
}

object BoundedTopM {

  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Fixed-capacity binary heap with the WORST element at the root
    * (worst = lowest score, ties broken by highest id), so a full heap
    * evicts in O(log m) only when a better candidate arrives. Backed by
    * two primitive arrays — no boxing in the hot path. */
  final class Heap(val m: Int) {
    var size: Int = 0
    var scores: Array[Double] = new Array[Double](math.min(m, 16))
    var ids: Array[Long] = new Array[Long](math.min(m, 16))

    /** is (s1,i1) worse than (s2,i2)? */
    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2)

    private def grow(): Unit = {
      val cap = math.min(m, math.max(scores.length * 2, 16))
      scores = java.util.Arrays.copyOf(scores, cap)
      ids = java.util.Arrays.copyOf(ids, cap)
    }

    def offer(s: Double, id: Long): Unit = {
      if (size < m) {
        if (size == scores.length) grow()
        scores(size) = s
        ids(size) = id
        size += 1
        siftUp(size - 1)
      } else if (worse(scores(0), ids(0), s, id)) {
        scores(0) = s
        ids(0) = id
        siftDown(0)
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0) {
        val p = (i - 1) / 2
        if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
        else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var i = start
      var continue = true
      while (continue) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) continue = false
        else { swap(i, w); i = w }
      }
    }

    /** Contents ordered best-first: (score desc, id asc). */
    def sortedBestFirst(): Array[(Double, Long)] = {
      val out = Array.tabulate(size)(i => (scores(i), ids(i)))
      scala.util.Sorting.stableSort(out,
        (a: (Double, Long), b: (Double, Long)) =>
          a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      out
    }
  }
}
