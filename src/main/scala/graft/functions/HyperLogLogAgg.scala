package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog cardinality sketch as one typed aggregate:
  * `hll_sketch(key, p)` emits the full register file as an
  * `array<bigint>` of `m = 2^p` entries (register j = max rank
  * observed in bucket j), completing the sketch trio — [[MisraGriesAgg]]
  * answers "which items are heavy", [[CountMinAgg]] "how often does
  * THIS item occur", this one "how many DISTINCT items exist"
  * (Flajolet et al. 2007). Each map task reduces its slice to the
  * fixed m-entry file before the exchange (wire cost `|tasks| · m`
  * longs, cardinality-independent), and merge is element-wise MAX —
  * associative, commutative, and IDEMPOTENT, so any partitioning
  * yields the bit-identical sketch and re-aggregating overlapping
  * data is harmless (strictly stronger than CMS's additive merge,
  * which needs the streaming store's overwrite discipline;
  * HllAggSpec asserts both properties).
  *
  * Cross-engine contract — the reason this sketch is HASH-GREEN
  * against DuckDB where Spark's own `approx_count_distinct` (q22)
  * can only be rows-only: every ingredient is recomputable in plain
  * SQL on both engines.
  *   - Hash: the repo's md5 device — `md5(CAST(key AS STRING))`,
  *     first 15 hex chars parsed base-16 = a 60-bit value (exactly
  *     OracleText.rotLong's r=0 form; identical digests and string
  *     casts on both engines).
  *   - Split: top `p` bits = bucket, low `60 − p` bits = suffix;
  *     rank = position of the suffix's first set bit counting from
  *     its MSB (`60 − p + 1` for an all-zero suffix) — in SQL via
  *     `instr(lpad(bin(suffix), 60 − p, '0'), '1')`: pure integer
  *     and string ops, no floating point anywhere.
  *   - Estimate: the harmonic sum Σ 2^−reg is kept EXACT by scaling:
  *     `S = Σ 2^(maxRank − reg)` is an integer sum of powers of two
  *     (≤ m · 2^49 < 2^63 at p = 12 — no overflow, no FP rounding,
  *     no summation-order dependence), and the raw estimate is ONE
  *     double division `K / S` with K = α_m · m² · 2^maxRank folded
  *     to a single Scala-computed constant embedded in both engines'
  *     SQL — one IEEE op, bit-equal everywhere.
  * The registered `q47_hll_distinct` emits (S, zero-register count,
  * raw estimate) per group; bias/small-range corrections are the
  * consumer's choice (the classic linear-counting branch needs `ln`,
  * whose last-ulp behavior differs across libm builds — kept OUT of
  * the hash-checked surface, exercised in HllAggSpec instead).
  */
case class HyperLogLogAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll_sketch precision must be in 4..16, got $p")

  private val m = 1 << p

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"hll_sketch expects a bigint key, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val key = child.eval(input)
    if (key != null) {
      val h = HyperLogLogAgg.hash60(key.asInstanceOf[Long])
      val bucket = (h >>> (60 - p)).toInt
      val rank = HyperLogLogAgg.rank(h, p)
      if (rank > buf(bucket)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Long](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLogAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLogAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HyperLogLogAgg =
    copy(child = newChild)
}

object HyperLogLogAgg {

  /** MD5 is not thread-safe and not free to construct — one instance
    * per thread.
    */
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The 60-bit hash of a key: first 15 hex chars of
    * `md5(CAST(key AS STRING))` parsed base-16 — bit-for-bit the SQL
    * expression both engines evaluate (OracleText.rotLong's r = 0
    * form). 15 hex chars = the first 7 digest bytes plus the high
    * nibble of byte 8.
    */
  def hash60(key: Long): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(java.lang.Long.toString(key).getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) >> 4) & 0xfL)
  }

  /** Rank of the low `60 − p` suffix bits: 1-based position of the
    * first set bit from the suffix's MSB; `60 − p + 1` when the
    * suffix is all zero. Mirrors the SQL
    * `instr(lpad(bin(suffix), 60 − p, '0'), '1')` exactly.
    */
  def rank(h: Long, p: Int): Int = {
    val lowBits = 60 - p
    val low = h & ((1L << lowBits) - 1)
    if (low == 0L) lowBits + 1
    else lowBits - (63 - java.lang.Long.numberOfLeadingZeros(low))
  }

  /** Standard HLL α_m for m ≥ 128 (p = 12 → m = 4096 here). */
  def alpha(m: Int): Double = 0.7213 / (1.0 + 1.079 / m)

  /** The single double constant of the raw estimator at precision
    * `p`: α_m · m² · 2^(60−p+1), so `estimate = K / S` with S the
    * integer-scaled harmonic sum — ONE IEEE division, bit-equal on
    * any engine that parses the same constant. Computed here once;
    * embedded in both the Spark query and the DuckDB mirror via
    * `Double.toString` (shortest round-trip form).
    */
  def estimatorK(p: Int): Double = {
    val m = 1 << p
    alpha(m) * (m.toDouble * m.toDouble) * math.pow(2.0, (60 - p + 1).toDouble)
  }
}
