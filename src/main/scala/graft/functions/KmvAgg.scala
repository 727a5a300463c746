package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values distinct sketch as one typed aggregate:
  * `kmv_sketch(key, k)` emits the `k` smallest DISTINCT 60-bit key
  * hashes, ascending, as an `array<bigint>` — the fourth member of the
  * sketch family (Bar-Yossef et al. 2002; "bottom-k" in the Beyer et
  * al. 2007 formulation). Where [[HyperLogLogAgg]] compresses harder
  * (one byte per register), KMV buys two capabilities HLL cannot
  * offer for its extra space:
  *   - the sketch IS a uniform hash-ordered sample of the distinct
  *     keys, so set operations compose: the intersection/union of two
  *     groups' sketches estimates THEIR overlap (the Jaccard path the
  *     `sourceOverlap` probe experiment would use at web scale);
  *   - in the exact regime (distinct ≤ k) it degrades to nothing at
  *     all — the sketch is simply the full distinct hash set and every
  *     downstream readout is exact, no estimator involved.
  *
  * Merge is sorted-set union truncated to k — associative, commutative
  * and IDEMPOTENT (a replayed slice re-inserts hashes already present:
  * `KmvAggSpec` asserts partitioning-invariance and duplicate
  * immunity), so like HLL and unlike CMS it is safe under
  * at-least-once delivery with no overwrite discipline. Wire cost is
  * `|tasks| · k` longs, key-cardinality-independent.
  *
  * Cross-engine contract (why the registered `q48_kmv_distinct` is
  * fully HASH-GREEN): the hash is the repo's md5 device
  * ([[HyperLogLogAgg.hash60]] — `md5(CAST(key AS STRING))`, first 15
  * hex chars parsed base-16), "k smallest distinct" is a plain
  * `row_number() OVER (ORDER BY hash) <= k` on DuckDB's side, and the
  * estimator is one double division of exactly-representable values:
  * `est = ((k − 1) · 2^60) / h_k` with the numerator folded to a
  * Scala-computed constant embedded in both engines' SQL
  * ([[KmvAgg.estimatorNum]]), `h_k` the k-th smallest hash. Below
  * capacity the readout is the exact distinct count — the regime
  * split both engines branch on identically.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 20), s"kmv_sketch k must be in 2..2^20, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch expects a bigint key, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val key = child.eval(input)
    if (key != null)
      insert(buf, HyperLogLogAgg.hash60(key.asInstanceOf[Long]))
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  /** Bounded insert: below capacity always admit; at capacity admit
    * only improvements on the current k-th minimum (TreeSet dedups).
    */
  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) buf.pollLast(); () }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvAgg {

  /** The exactly-representable double numerator of the KMV estimator
    * at capacity `k`: `(k − 1) · 2^60`. For any k ≤ 2^20 the product
    * has ≤ 20 significant bits, so the double is EXACT and
    * `Double.toString`'s shortest round-trip form parses identically
    * on both engines; the estimate `num / h_k` is then one IEEE
    * division.
    */
  def estimatorNum(k: Int): Double = (k - 1).toDouble * math.pow(2.0, 60.0)
}
