package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash as ONE typed aggregate: `simhash_agg(word)` folds
  * each word's md5 nibble parities (±1 per bit) into a single 32-int
  * buffer and emits the 32-char sign bitstring.
  *
  * The composed form ([[graft.operators.TextOps.simhash]]) needs a
  * digest projection plus 32 separate `sum` aggregate expressions —
  * 32 agg buffers, 32 shuffle columns, and the suite's largest codegen
  * unit. This aggregate is the §7.3 "custom pieces" case for AGGREGATES
  * (CosineSimilarity covers scalar expressions): one buffer, one
  * shuffle column (128 serialized bytes/doc), partial aggregation
  * map-side by the TypedImperativeAggregate contract.
  *
  * Bit-compatibility with the composed form (and hence the same DuckDB
  * oracle): hex digit j of the digest has parity = low bit of nibble j
  * of the raw bytes, each word contributes `2*parity - 1` per bit,
  * integer sums are order-independent, and the emitted string is
  * `cnt > 0 ? '1' : '0'` per position. Proven by `txt_simhash_native`
  * verifying against `txt_simhash`'s oracle.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  // fail at analysis time on a non-string argument; the update path
  // blind-casts to UTF8String and would otherwise die per-task mid-job
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg expects a string argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](32)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val d = SimHashAgg.digest(v.asInstanceOf[UTF8String].getBytes)
      var j = 0
      while (j < 32) {
        val nib =
          if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf
          else d(j >> 1) & 0xf
        buf(j) += 2 * (nib & 1) - 1
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 32) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val cs = new Array[Char](32)
    var j = 0
    while (j < 32) { cs(j) = if (buf(j) > 0) '1' else '0'; j += 1 }
    UTF8String.fromString(new String(cs))
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(128)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(32)(bb.getInt())
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

object SimHashAgg {
  // MessageDigest is stateful and not thread-safe; tasks run on a pool
  private val local = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  private def digest(bytes: Array[Byte]): Array[Byte] = {
    val md = local.get()
    md.reset()
    md.digest(bytes)
  }
}
