package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.EsShapedSource

/** [[graft.sources.EsShapedSource]] — the DataSourceV2 connector seam.
  * Beyond the registered-query parity (svc_latest_es / dsl_search_es,
  * oracle- and golden-checked), this spec pins the connector's own
  * contracts: row-group pruning from footer stats, metadata-only
  * counts, filter/projection pushdown parity with the native parquet
  * source, and null semantics at the boundary.
  */
class EsShapedSourceSpec extends SparkSpec {

  private val fmt = classOf[EsShapedSource].getName

  private def viaEs(path: String): DataFrame =
    spark.read.format(fmt).load(path)

  test("full-table read equals the native parquet read (events, documents)") {
    for (t <- Seq("events", "documents")) {
      val es = viaEs(s"$sfDir/$t.parquet")
      val pq = spark.read.parquet(s"$sfDir/$t.parquet")
      assert(es.schema === pq.schema, t)
      assert(es.exceptAll(pq).isEmpty && pq.exceptAll(es).isEmpty, t)
    }
  }

  test("filtered + projected read equals parquet under every pushed shape") {
    val cases = Seq[DataFrame => DataFrame](
      _.where(col("n_chars") > 400).select("doc_id", "lang"),
      _.where(col("lang") === "en" && col("source") =!= "web")
        .select("doc_id", "n_chars"),
      _.where(col("lang").isin("en", "de") || col("n_chars") < 100)
        .select("doc_id"), // Or stays Spark-side — residual eval contract
      _.where(col("source").startsWith("w")).select("doc_id", "source"),
      _.where(col("lang").isNull).select("doc_id"))
    for ((f, i) <- cases.zipWithIndex) {
      val es = f(viaEs(s"$sfDir/documents.parquet"))
      val pq = f(spark.read.parquet(s"$sfDir/documents.parquet"))
      assert(es.exceptAll(pq).isEmpty && pq.exceptAll(es).isEmpty, s"case $i")
    }
  }

  test("timestamp range filter pushes and matches the native read") {
    val bound = spark.read.parquet(s"$sfDir/events.parquet")
      .agg(max(col("ts"))).head().get(0)
    val es = viaEs(s"$sfDir/events.parquet").where(col("ts") >= lit(bound))
    val pq = spark.read.parquet(s"$sfDir/events.parquet")
      .where(col("ts") >= lit(bound))
    assert(es.count() === pq.count())
    assert(es.count() >= 1)
    val p = es.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      p.take(800))
  }

  test("row-group pruning: a selective range schedules only matching row groups") {
    // 4 row groups of 1000 rows each with disjoint ascending id ranges
    val dir = Files.createTempDirectory("es-shaped").toString
    import spark.implicits._
    (0L until 4000L).map(i => (i, s"s-${i % 7}", i.toDouble))
      .toDF("id", "tag", "v")
      .coalesce(1)
      .sortWithinPartitions("id")
      .write.option("parquet.block.size", "4096").mode("overwrite")
      .parquet(s"$dir/t.parquet")
    val file = new java.io.File(s"$dir/t.parquet").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getPath
    val all = viaEs(file)
    val groups = all.rdd.getNumPartitions
    assert(groups >= 3, s"fixture produced only $groups row groups")
    // one InputPartition per SURVIVING row group: a top-of-range filter
    // must prune the lower groups from the schedule entirely
    val cut = all.where(col("id") >= 3900L)
    assert(cut.rdd.getNumPartitions < groups,
      s"pruning scheduled all $groups groups")
    assert(cut.count() === 100L)
    // and an impossible range schedules nothing
    assert(all.where(col("id") > 100000L).rdd.getNumPartitions === 0)
  }

  test("count(*) is a metadata-only read (zero-column partitions still count rows)") {
    val es = viaEs(s"$sfDir/documents.parquet")
    val pq = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(es.count() === pq.count())
  }

  test("array columns round-trip (ES `fields` responses are array-valued)") {
    // embeddings carries array<float> — the fixture's own nested shape
    val es = viaEs(s"$sfDir/embeddings.parquet")
    val pq = spark.read.parquet(s"$sfDir/embeddings.parquet")
    assert(es.schema === pq.schema)
    assert(es.exceptAll(pq).isEmpty && pq.exceptAll(es).isEmpty)
    // array<string> with nulls and empties — the asset edge-list shape
    import spark.implicits._
    val dir = Files.createTempDirectory("es-arr").toString
    Seq((1L, Seq("a", "b", null)), (2L, Seq.empty[String]), (3L, null))
      .toDF("id", "edges").write.parquet(s"$dir/t.parquet")
    val esA = viaEs(s"$dir/t.parquet")
    val pqA = spark.read.parquet(s"$dir/t.parquet")
    assert(esA.schema === pqA.schema)
    assert(esA.exceptAll(pqA).isEmpty && pqA.exceptAll(esA).isEmpty)
    // deeper nesting (map/struct) still fails fast at schema inference
    Seq((1L, ((2L, "x")))).toDF("id", "s").write.parquet(s"$dir/nested.parquet")
    val e = intercept[Exception] { viaEs(s"$dir/nested.parquet").schema }
    assert(e.getMessage.contains("wire surface"), e.getMessage)
  }

  test("MILLIS-encoded INT64 timestamps normalize to micros (values, filters, pruning)") {
    val dir = Files.createTempDirectory("es-millis").toString
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
      spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
        .write.parquet(s"$dir/t.parquet")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    val es = viaEs(s"$dir/t.parquet")
    val pq = spark.read.parquet(s"$dir/t.parquet")
    assert(es.schema === pq.schema)
    assert(es.exceptAll(pq).isEmpty && pq.exceptAll(es).isEmpty)
    // pushed range predicate: micros constant vs millis column — the
    // 1000x trap; row counts must match the native source, and the
    // stats-pruned schedule must not drop matching groups
    val bound = pq.agg(max(col("ts"))).head().getTimestamp(0)
    val esCut = es.where(col("ts") >= lit(bound))
    val pqCut = pq.where(col("ts") >= lit(bound))
    assert(esCut.count() === pqCut.count())
    assert(esCut.count() >= 1)
  }

  test("a table-schema column missing from one file null-fills (heterogeneous files)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("es-hetero").toString
    val tdir = new java.io.File(s"$dir/t.parquet"); tdir.mkdirs()
    def onePart(df: DataFrame, out: String): Unit = {
      val tmp = Files.createTempDirectory("es-part").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(tdir, out).toPath)
    }
    onePart(Seq((1L, "x"), (2L, "y")).toDF("id", "tag"), "a.parquet")
    onePart(Seq(Tuple1(3L)).toDF("id"), "b.parquet")
    // inferSchema reads the first (sorted) file: a.parquet carries both
    val es = viaEs(s"$dir/t.parquet")
    assert(es.schema.fieldNames.toSeq === Seq("id", "tag"))
    val rows = es.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows(2).isNullAt(1), "missing column must null-fill")
    // and a predicate on the missing column evaluates null-rejecting
    assert(es.where(col("tag") === "x").count() === 1L)
    assert(es.where(col("tag").isNull).count() === 1L)
  }

  test("the session's hadoop configuration ships to executor readers") {
    val conf = graft.sources.EsShaped.sessionConf()
    // session-level spark.hadoop.* must be visible (newHadoopConf path)
    spark.sparkContext.hadoopConfiguration.set("graft.test.marker", "m1")
    assert(graft.sources.EsShaped.sessionConf().get("graft.test.marker") === "m1")
    // and the executor-bound wrapper survives java serialization
    val ship = new graft.sources.EsShaped.SerializableConf(
      graft.sources.EsShaped.sessionConf())
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(ship)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.sources.EsShaped.SerializableConf]
    assert(back.value.get("graft.test.marker") === "m1")
    assert(conf != null)
  }

  test("multi-path load unions (and double-counts a repeated path, ES multi-index style)") {
    val one = viaEs(s"$sfDir/documents.parquet").count()
    val two = spark.read.format(fmt)
      .load(s"$sfDir/documents.parquet", s"$sfDir/documents.parquet").count()
    assert(two === 2 * one)
  }

  test("reported statistics shrink under pushdown (broadcast-eligibility at scale)") {
    def sizeOf(df: DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val full = sizeOf(viaEs(s"$sfDir/documents.parquet"))
    val pruned = sizeOf(viaEs(s"$sfDir/documents.parquet").select("doc_id"))
    assert(pruned < full, s"$pruned !< $full")
    // and nothing reports the catch-all default (which would make every
    // connector join SMJ at the planner's eyes)
    assert(full < BigInt(Long.MaxValue) / 4)
  }

  test("pushed filter flips the join strategy: CBO broadcasts the pruned connector read") {
    // 4 disjoint row groups; a top-of-range filter prunes 3 of them
    val dir = Files.createTempDirectory("es-cbo").toString
    import spark.implicits._
    (0L until 4000L).map(i => (i, s"s-${i % 7}", i.toDouble))
      .toDF("id", "tag", "v")
      .coalesce(1).sortWithinPartitions("id")
      .write.option("parquet.block.size", "4096").parquet(s"$dir/t.parquet")
    val file = new java.io.File(s"$dir/t.parquet").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getPath
    def sizeOf(df: DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val fullSize = sizeOf(viaEs(file))
    val prunedSize = sizeOf(viaEs(file).where(col("id") >= 3900L))
    assert(prunedSize < fullSize, s"$prunedSize !< $fullSize")
    // a threshold BETWEEN the pruned and full estimates: only the
    // estimateStatistics row-group arithmetic can earn the broadcast
    val threshold = (prunedSize + fullSize) / 2
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
      // other side: well above the threshold, never the build side
      val other = spark.range(threshold.toLong) // 8 bytes/row > threshold
        .select(col("id"), (col("id") % 7).as("w"))
      def joinPlan(left: DataFrame): String =
        left.join(other, Seq("id")).queryExecution.sparkPlan.toString
      val unfiltered = joinPlan(viaEs(file))
      val filtered = joinPlan(viaEs(file).where(col("id") >= 3900L))
      assert(unfiltered.contains("SortMergeJoin") &&
        !unfiltered.contains("BroadcastHashJoin"),
        s"unfiltered should exceed the threshold:\n${unfiltered.take(900)}")
      assert(filtered.contains("BroadcastHashJoin"),
        s"pruned read should broadcast:\n${filtered.take(900)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
