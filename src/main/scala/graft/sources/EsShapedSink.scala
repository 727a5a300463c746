package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types._

/** WRITE side of the [[EsShapedSource]] connector — the reference's
  * OTHER process boundary: every run ends in one `esClient.bulk` POST
  * of EAN-keyed documents (`lib/es_client.ts:29-31`, intended call
  * site `run.ts:12-16`), against an index whose template was installed
  * at CLIENT CONSTRUCTION (`es_client.ts:48`). This file reproduces
  * that contract against the harness's parquet fixtures:
  *
  *   - '''Template bootstrap at writer construction''': building the
  *     batch write materializes `_template.json`
  *     ([[AssetSink.indexTemplateJson]] — the exact request body the
  *     reference PUTs) into the index directory if absent, before any
  *     document lands — the `putIndexTemplate`-then-`bulk` ordering.
  *   - '''Generation snapshots with an atomic pointer''': each commit
  *     publishes a new `gen-N/` directory of executor-written parquet
  *     part files and then swaps the `_latest` pointer — readers never
  *     see a half-written bulk (ES's refresh/visibility contract).
  *     Aborted generations are unreferenced files, invisible by
  *     construction.
  *   - '''EAN-keyed idempotent upsert''' ([[EsShapedSink.upsertInto]]):
  *     the ES `index` bulk action replaces the stored document with
  *     the same `_id`; here the merge runs as an ENGINE job — the live
  *     snapshot anti-joined on the batch's ids, unioned with the
  *     batch, published as the next generation — exactly the
  *     lakehouse-MERGE architecture (the connector provides snapshot
  *     isolation; the join is Catalyst's). Replaying a batch is a
  *     state no-op, the StreamingDsl replay discipline applied at the
  *     writer (spec-proven, incl. through `foreachBatch`).
  *
  * Scale shape: the per-commit cost is one broadcast anti-join of the
  * live state against the batch's id set plus a rewrite of the live
  * snapshot — ES pays the same write amplification inside segment
  * merging; an LSM segment log with read-side collapse would amortize
  * the rewrite and is the documented production refinement (the
  * generation/pointer layout IS that log's structure — only the
  * compaction policy differs). Single-writer by contract, like the
  * reference's one ETL run per schedule.
  */
object EsShapedSink {

  /** Directory-layout names shared by the read and write sides. */
  val LatestPointer = "_latest"
  val TemplateFile = "_template.json"
  private[sources] def genDirName(n: Int): String = s"gen-$n"

  /** Publish `df` as the index's NEW live state (the force-merged
    * snapshot): a fresh generation + pointer swap, template bootstrap
    * included. Overwrite-shaped on purpose — the append-shaped entry
    * point is [[upsertInto]], which composes the id-keyed merge.
    */
  def publish(df: DataFrame, path: String): Unit =
    df.write.format(classOf[EsShapedSource].getName)
      .mode("overwrite").save(path)

  /** The ES `_bulk` upsert through the connector: every stored doc
    * whose `idCol` appears in `batch` is replaced by the batch row,
    * new ids are added, untouched ids carry over. The batch must be
    * id-unique (a DataFrame is unordered, so ES's last-action-wins
    * within one bulk has no deterministic analog — fail fast instead).
    * Idempotent: re-running the same batch reproduces the identical
    * state bit for bit.
    */
  def upsertInto(df: DataFrame, path: String, idCol: String): Unit = {
    val spark = df.sparkSession
    val dups = df.groupBy(col(idCol))
      .count().where(col("count") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"upsert batch carries duplicate $idCol '${dups.headOption.map(_.get(0))
        .getOrElse("")}' — an unordered frame has no last-wins order")
    val conf = EsShaped.sessionConf()
    val merged =
      if (EsShaped.liveGeneration(path, conf).isEmpty) df
      else {
        val live = spark.read.format(classOf[EsShapedSource].getName).load(path)
        live.join(broadcast(df.select(col(idCol)).distinct()),
            Seq(idCol), "left_anti")
          .unionByName(df)
          // the anti-join hoists the key column; restore the stored
          // column order so the published schema never drifts
          .select(live.columns.map(col).toSeq: _*)
      }
    // materialize BEFORE the overwrite plans: the merge reads the very
    // generation the publish replaces (same discipline as any
    // read-your-own-table MERGE)
    publish(merged.localCheckpoint(), path)
  }

  /** Read the live index state back. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(classOf[EsShapedSource].getName).load(path)
}

private[sources] final class EsShapedWriteBuilder(paths: Seq[String],
    info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {

  private var isTruncate = false

  override def truncate(): WriteBuilder = { isTruncate = true; this }

  override def build(): Write = new Write {
    require(paths.size == 1,
      s"es-shaped write needs exactly one path, got $paths")
    override def toBatch: BatchWrite =
      new EsShapedBatchWrite(paths.head, info.schema(), isTruncate)
  }
}

private final case class EsShapedCommit(file: String, rows: Long)
    extends WriterCommitMessage

/** One batch write = one staged generation. Constructing the write
  * bootstraps the index (directory + template), mirroring the
  * reference's template-install-at-client-construction.
  */
private final class EsShapedBatchWrite(path: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {

  private val conf = EsShaped.sessionConf()
  EsShaped.bootstrapIndex(path, conf)
  require(truncate || EsShaped.liveGeneration(path, conf).isEmpty,
    "es-shaped append into a non-empty index would shadow the live " +
      "documents: use SaveMode.Overwrite (snapshot publish) or " +
      "EsShapedSink.upsertInto (the EAN-keyed bulk merge)")
  private val gen = EsShaped.nextGeneration(path, conf)
  private val ship = new EsShaped.SerializableConf(conf)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new EsShapedWriterFactory(path, gen, schema, ship)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    EsShaped.publishGeneration(path, gen, conf)

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // unreferenced (the pointer never moved); remove the stage
    val p = new Path(path, EsShapedSink.genDirName(gen))
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }
}

private final class EsShapedWriterFactory(path: String, gen: Int,
    schema: StructType, conf: EsShaped.SerializableConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new EsShapedDataWriter(path, gen, schema, conf.value, partitionId, taskId)
}

/** Executor-side parquet writer for one task's rows (hand-built on
  * parquet-mr like the read side — the connector never routes through
  * Spark's own parquet source).
  */
private final class EsShapedDataWriter(path: String, gen: Int,
    schema: StructType, conf: Configuration, partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {

  private val message: MessageType = EsShaped.parquetSchema(schema)
  private val file = new Path(new Path(path, EsShapedSink.genDirName(gen)),
    f"part-$partitionId%05d-$taskId.parquet")
  private val writer = ExampleParquetWriter.builder(
      org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
    .withConf(conf)
    .withType(message)
    .withCompressionCodec(CompressionCodecName.SNAPPY)
    .build()
  private val factory = new SimpleGroupFactory(message)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val name = schema(i).name
        schema(i).dataType match {
          case LongType => g.add(name, row.getLong(i))
          case IntegerType => g.add(name, row.getInt(i))
          case DoubleType => g.add(name, row.getDouble(i))
          case FloatType => g.add(name, row.getFloat(i))
          case BooleanType => g.add(name, row.getBoolean(i))
          case StringType => g.add(name,
            Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
          case TimestampType | TimestampNTZType =>
            g.add(name, row.getLong(i)) // micros, the schema's annotation
          case ArrayType(et, _) =>
            val arr = row.getArray(i)
            val listGroup = g.addGroup(name)
            var j = 0
            while (j < arr.numElements()) {
              val wrapper = listGroup.addGroup("list")
              if (!arr.isNullAt(j)) et match {
                case LongType => wrapper.add("element", arr.getLong(j))
                case IntegerType => wrapper.add("element", arr.getInt(j))
                case DoubleType => wrapper.add("element", arr.getDouble(j))
                case FloatType => wrapper.add("element", arr.getFloat(j))
                case BooleanType => wrapper.add("element", arr.getBoolean(j))
                case StringType => wrapper.add("element",
                  Binary.fromConstantByteArray(arr.getUTF8String(j).getBytes))
                case other => throw new UnsupportedOperationException(
                  s"es-shaped write: list element $other")
              }
              j += 1
            }
          case other => throw new UnsupportedOperationException(
            s"es-shaped write: column type $other")
        }
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    EsShapedCommit(file.toString, rows)
  }

  override def abort(): Unit = {
    writer.close()
    val fs = file.getFileSystem(conf)
    if (fs.exists(file)) { fs.delete(file, false); () }
  }

  override def close(): Unit = ()
}
