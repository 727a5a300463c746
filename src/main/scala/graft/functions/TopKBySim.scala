package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as ONE typed aggregate: `topk_by_sim(id, sim, k)`
  * keeps the k best (sim DESC, id ASC) pairs per group and emits them
  * best-first as `array<struct<neighbor_id, sim>>`.
  *
  * Why this exists (the §7.3 "custom pieces" case for ORDER-SENSITIVE
  * aggregates; SimHashAgg covers commutative ones): the composed top-k
  * is `row_number() OVER (PARTITION BY query ORDER BY sim DESC, id)`
  * + filter, and a window SHUFFLES EVERY SCORED ROW — N·|Q| rows for a
  * KNN scan — before it can rank. This aggregate runs under normal
  * partial aggregation: each map task reduces its slice to ≤ k rows
  * per group, so the exchange carries |tasks|·|groups|·k entries
  * instead of N·|Q| (at 10⁹ vectors × 50 queries × k=10, that is the
  * difference between shuffling 5·10¹⁰ rows and ~16k per thousand
  * tasks). Spark's own InferWindowGroupLimit (3.5+) bounds the window
  * variant's SORT cost the same way but still shuffles the full input;
  * the aggregate form moves the cut before the wire.
  *
  * Determinism: the kept set and its order are defined by the strict
  * total order (sim DESC, id ASC) — insertion order cannot change the
  * result, so partial aggregation and any partitioning yield identical
  * output (two entries equal on BOTH fields are interchangeable AND
  * identical). Ranks derived from array position equal the window
  * form's `row_number` under the same ORDER BY — proven differentially
  * by `emb_knn_topk` verifying against `emb_knn_exact`'s DuckDB oracle.
  *
  * Buffer: two parallel arrays kept sorted best-first (k is small by
  * contract — this is a per-group result cut, not a general sort);
  * update is a binary search + shift, merge inserts the smaller side's
  * entries. Serialized form: one int + k·16 bytes.
  */
case class TopKBySim(
    idChild: Expression,
    simChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBySim.Buffer] with BinaryLike[Expression] {

  require(k > 0, s"topk_by_sim k must be positive, got $k")

  override def left: Expression = idChild
  override def right: Expression = simChild

  override def checkInputDataTypes(): TypeCheckResult =
    if (idChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_sim expects a bigint id, got ${idChild.dataType.simpleString}")
    else if (simChild.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_sim expects a double sim, got ${simChild.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBySim.Buffer =
    new TopKBySim.Buffer(k)

  override def update(buf: TopKBySim.Buffer, input: InternalRow): TopKBySim.Buffer = {
    val id = idChild.eval(input)
    val sim = simChild.eval(input)
    if (id != null && sim != null)
      buf.insert(id.asInstanceOf[Long], sim.asInstanceOf[Double])
    buf
  }

  override def merge(a: TopKBySim.Buffer, b: TopKBySim.Buffer): TopKBySim.Buffer = {
    var i = 0
    while (i < b.size) { a.insert(b.ids(i), b.sims(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBySim.Buffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.ids(i), buf.sims(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBySim.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.ids(i)); bb.putDouble(buf.sims(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBySim.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBySim.Buffer(k)
    buf.size = n
    var i = 0
    while (i < n) { buf.ids(i) = bb.getLong(); buf.sims(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by_sim"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBySim =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBySim =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKBySim =
    copy(idChild = newLeft, simChild = newRight)
}

object TopKBySim {

  /** Parallel arrays kept sorted by (sim DESC, id ASC); at most k live. */
  final class Buffer(val k: Int) {
    val ids = new Array[Long](k)
    val sims = new Array[Double](k)
    var size: Int = 0

    /** True when (sim1, id1) outranks (sim2, id2). */
    @inline private def better(sim1: Double, id1: Long, sim2: Double, id2: Long): Boolean =
      sim1 > sim2 || (sim1 == sim2 && id1 < id2)

    def insert(id: Long, sim: Double): Unit = {
      if (size == k && !better(sim, id, sims(size - 1), ids(size - 1))) return
      // binary search for the insertion point in best-first order
      var lo = 0
      var hi = size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (better(sims(mid), ids(mid), sim, id)) lo = mid + 1 else hi = mid
      }
      val last = math.min(size, k - 1)
      var i = last
      while (i > lo) { ids(i) = ids(i - 1); sims(i) = sims(i - 1); i -= 1 }
      ids(lo) = id
      sims(lo) = sim
      if (size < k) size += 1
    }
  }
}
