package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitters sketch as one typed aggregate:
  * `misra_gries(key, capacity)` keeps at most `capacity` counters and
  * emits `array<struct<item, cnt>>` sorted (cnt DESC, item ASC).
  *
  * Why a sketch and not `GROUP BY key ORDER BY count(*) DESC LIMIT n`:
  * the exact form shuffles one row per DISTINCT key. For frequency
  * diagnostics over a 100 TB corpus key domain (URLs, n-grams, user
  * ids) the distinct count is itself corpus-sized, while the questions
  * asked ("which items exceed 0.1% of the mass?") need only the heavy
  * tail. This aggregate reduces each map task's slice to ≤ capacity
  * counters before the exchange — the wire carries |tasks|·capacity
  * entries regardless of the key cardinality, the same partial-
  * aggregation shape TopKBySim uses for order-sensitive top-k.
  *
  * Guarantees (Misra-Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): with capacity k over n rows each
  * retained estimate ĉ satisfies c − n/(k+1) ≤ ĉ ≤ c (c = true count),
  * and every item with c > n/(k+1) is retained. Summaries merge by
  * pairwise counter addition followed by subtracting the (k+1)-largest
  * value — the bound is preserved, so partial aggregation over any
  * partitioning stays within it (MisraGriesAggSpec asserts both).
  *
  * Exact regime: when the true distinct count ≤ k no decrement ever
  * fires (neither in update nor in merge), so every count is exact and
  * the output is partitioning-independent. The registered
  * `q44_heavy_hitters` query runs in this regime, which is what makes
  * a DuckDB GROUP-BY oracle a valid differential check; the
  * approximate regime is pinned by unit bounds instead (counts may
  * then legitimately differ by partitioning, like any sketch).
  *
  * Buffer: open-addressed parallel long arrays (no per-entry boxing);
  * the decrement path compacts in place. Serialized form: one int +
  * size·16 bytes.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Buffer] with UnaryLike[Expression] {

  require(capacity > 0, s"misra_gries capacity must be positive, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries expects a bigint key, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MisraGriesAgg.Buffer =
    new MisraGriesAgg.Buffer(capacity)

  override def update(buf: MisraGriesAgg.Buffer, input: InternalRow): MisraGriesAgg.Buffer = {
    val key = child.eval(input)
    if (key != null) buf.add(key.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(a: MisraGriesAgg.Buffer, b: MisraGriesAgg.Buffer): MisraGriesAgg.Buffer = {
    var i = 0
    while (i < b.size) { a.addForMerge(b.items(i), b.counts(i)); i += 1 }
    a.pruneToCapacity()
    a
  }

  override def eval(buf: MisraGriesAgg.Buffer): Any = {
    val order = (0 until buf.size).sortBy(i => (-buf.counts(i), buf.items(i)))
    new GenericArrayData(order.map(i => InternalRow(buf.items(i), buf.counts(i))).toArray[Any])
  }

  override def serialize(buf: MisraGriesAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.items(i)); bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new MisraGriesAgg.Buffer(capacity)
    var i = 0
    while (i < n) { buf.appendRaw(bb.getLong(), bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object MisraGriesAgg {

  /** Parallel (item, count) arrays; linear-probe index over them.
    * Update-path decrements keep size ≤ k; merges may transiently grow
    * to 2k before [[pruneToCapacity]] cuts back.
    */
  final class Buffer(val k: Int) {
    // merge can hold both sides before pruning, hence 2k slots
    var items = new Array[Long](2 * k)
    var counts = new Array[Long](2 * k)
    var size: Int = 0
    // open-addressed slot index: values are (position+1), 0 = empty
    private var tableBits = 6
    private var table = new Array[Int](1 << tableBits)

    private def findSlot(item: Long): Int = {
      val mask = table.length - 1
      var h = java.lang.Long.hashCode(item * 0x9e3779b97f4a7c15L) & mask
      while (table(h) != 0 && items(table(h) - 1) != item) h = (h + 1) & mask
      h
    }

    private def rehash(): Unit = {
      tableBits += 1
      table = new Array[Int](1 << tableBits)
      var i = 0
      while (i < size) { table(findSlot(items(i))) = i + 1; i += 1 }
    }

    /** Deserialization fast path: entries are already distinct. */
    def appendRaw(item: Long, count: Long): Unit = {
      items(size) = item; counts(size) = count; size += 1
      if (size * 4 > table.length * 3) rehash()
      else table(findSlot(item)) = size
    }

    /** Classic update: increment if tracked, insert if room, else
      * decrement every counter (the new item is NOT inserted).
      */
    def add(item: Long, by: Long): Unit = {
      val slot = findSlot(item)
      if (table(slot) != 0) counts(table(slot) - 1) += by
      else if (size < k) { table(slot) = size + 1; items(size) = item; counts(size) = by; size += 1
        if (size * 4 > table.length * 3) rehash()
      } else decrementAll(by)
    }

    /** Merge path: insert unconditionally (capacity is restored by
      * [[pruneToCapacity]] once, after all entries are in).
      */
    def addForMerge(item: Long, by: Long): Unit = {
      val slot = findSlot(item)
      if (table(slot) != 0) counts(table(slot) - 1) += by
      else { table(slot) = size + 1; items(size) = item; counts(size) = by; size += 1
        if (size * 4 > table.length * 3) rehash()
      }
    }

    private def decrementAll(by: Long): Unit = {
      var i = 0
      var out = 0
      while (i < size) {
        counts(i) -= by
        if (counts(i) > 0) { items(out) = items(i); counts(out) = counts(i); out += 1 }
        i += 1
      }
      size = out
      reindex()
    }

    /** Mergeable-summaries cut: subtract the (k+1)-largest count from
      * all counters and drop the non-positive — size returns to ≤ k
      * while every surviving estimate keeps the MG lower-bound
      * property. No-op when already within capacity (the exact regime).
      */
    def pruneToCapacity(): Unit = {
      if (size <= k) return
      val sorted = counts.slice(0, size).sorted(Ordering.Long.reverse)
      decrementAll(sorted(k))
    }

    private def reindex(): Unit = {
      java.util.Arrays.fill(table, 0)
      var i = 0
      while (i < size) { table(findSlot(items(i))) = i + 1; i += 1 }
    }
  }
}
