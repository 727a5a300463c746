package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch as one typed aggregate: `cms_sketch(key, depth,
  * width)` emits the full counter grid as a flat `array<bigint>` of
  * `depth · width` cells (row-major), to be probed by
  * [[CountMinAgg.lookupExpr]].
  *
  * The frequency-sketch complement of [[MisraGriesAgg]]: MG answers
  * "which items are heavy" within a fixed counter budget; CMS answers
  * "how often does THIS item occur" for any item, with a one-sided
  * error — estimates never undercount, and overcount by at most
  * `εN` (ε = e/width) with probability `1 − e^−depth` (Cormode &
  * Muthukrishnan 2005). Both reduce each map task's slice to a
  * fixed-size summary before the exchange: the wire carries
  * `|tasks| · depth · width` longs regardless of key cardinality, and
  * merge is cell-wise addition — associative and commutative, so any
  * partitioning yields the identical sketch (CountMinAggSpec asserts
  * bit-equality across partitionings; contrast MG, whose merge is
  * order-dependent OUTSIDE its exact regime).
  *
  * Hash family: row 0 is the IDENTITY hash `key mod width` — a valid
  * member of the 2-universal family (a=1, b=0) with a load-bearing
  * consequence: when every key fits the width (`0 ≤ key < width`),
  * row 0 gives each key a private cell, so `min` over rows is EXACT
  * for present keys and 0 for absent ones. The registered
  * `q46_cms_counts` runs in this regime (width 2048 > max user_id at
  * every test SF), which is what makes a DuckDB exact-count oracle a
  * valid differential check — the same device as q44's exact-regime
  * Misra-Gries. Rows ≥ 1 use `((a_d·key + b_d) mod p) mod width` with
  * p = 2^31 − 1 and LCG-derived per-row constants, reproducible in
  * plain SQL arithmetic on both engines (all products < 2^62: no
  * overflow under ANSI mode).
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16, s"cms_sketch depth must be in 1..16, got $depth")
  require(width > 0 && width <= (1 << 22),
    s"cms_sketch width must be in 1..4194304, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch expects a bigint key, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val key = child.eval(input)
    if (key != null) {
      val k = key.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buf(d * width + CountMinAgg.cell(k, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {

  /** 2^31 − 1: the classic Carter–Wegman prime. */
  val P = 2147483647L

  /** Per-row multiplier/offset — LCG-derived, row 0 = identity. */
  def aOf(d: Int): Long = if (d == 0) 1L else (1103515245L * (d + 1) + 12345L) % P
  def bOf(d: Int): Long = if (d == 0) 0L else (2654435761L * d + 1013904223L) % P

  /** Row-d cell of a key — non-negative keys only in the SQL mirror;
    * the Scala side floors negatives the same way `pmod` does.
    */
  def cell(key: Long, d: Int, width: Int): Int = {
    val h = java.lang.Math.floorMod(aOf(d) * java.lang.Math.floorMod(key, P) + bOf(d), P)
    java.lang.Math.floorMod(h, width.toLong).toInt
  }

  /** Spark SQL expression estimating `key`'s count from a `sketch`
    * column (the flat grid [[CountMinAgg]] emits): `min` over rows of
    * the key's cell — `element_at` is 1-based. Mirrored literally in
    * DuckDB by [[graft.OracleRelational.q46]].
    */
  def lookupExpr(sketch: String, key: String, depth: Int, width: Int): String = {
    val rows = (0 until depth).map { d =>
      val h = s"pmod(pmod(${aOf(d)}L * pmod($key, ${P}L) + ${bOf(d)}L, ${P}L), ${width}L)"
      s"element_at($sketch, CAST($d * $width + $h + 1 AS INT))"
    }
    if (rows.size == 1) rows.head else rows.mkString("least(", ", ", ")")
  }
}
