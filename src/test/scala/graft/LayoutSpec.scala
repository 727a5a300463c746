package graft

import org.apache.spark.sql.functions._

import graft.sources.{Layout, Tables}

/** Storage-layout operators: read-side plan shape (the whole point of
  * the layouts) plus result equivalence against the layout-free form.
  */
class LayoutSpec extends SparkSpec {

  test("q45: co-bucketed join plans with zero join-side exchanges") {
    val df = Layout.q45BucketedJoin(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("Bucketed: true"), plan.take(2000))
    val joinKeyExchanges = plan.split("\n").count(l =>
      l.contains("Exchange hashpartitioning(o_orderkey") ||
        l.contains("Exchange hashpartitioning(l_orderkey"))
    assert(joinKeyExchanges === 0,
      s"bucket layout should remove join-side shuffles:\n$plan")
  }

  test("q45: bucketed result equals the layout-free join") {
    val bucketed = Layout.q45BucketedJoin(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    val plain = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("lines"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(bucketed === plain)
  }

  test("evt_partition_pruned: the date window binds as a partition filter") {
    val df = Layout.evtPartitionPruned(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"),
      plan.take(2000))
    assert(plan.contains("event_date"), plan.take(2000))
    // the window predicate must NOT appear as a post-scan data filter:
    // partition pruning happens at file listing, before any row is read
    assert(!plan.contains("PushedFilters: [IsNotNull(event_date"),
      s"event_date should be a partition column, not a data column:\n$plan")
  }

  test("evt_partition_pruned: scan reads only the 7 in-window day directories") {
    // input_file_name() sees the files the PRUNED scan actually reads
    // (Dataset.inputFiles would report the relation's full listing)
    val (path, schema) = Layout.partitionedEvents(spark, sfDir)
    val days = spark.read.schema(schema).parquet(path)
      .where(col("event_date").between(
        lit("2024-01-08").cast("date"), lit("2024-01-14").cast("date")))
      .select(input_file_name().as("f")).distinct().collect()
      .flatMap(_.getString(0).split("/").find(_.startsWith("event_date=")))
      .toSet
    assert(days.size === 7, days.mkString(", "))
    assert(days.forall { d =>
      val day = d.stripPrefix("event_date=")
      day >= "2024-01-08" && day <= "2024-01-14"
    }, days.mkString(", "))
  }

  test("evt_partition_pruned: result equals the unpartitioned predicate") {
    val pruned = Layout.evtPartitionPruned(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val plain = Tables.events(spark, sfDir)
      .where(to_date(col("ts")).between(
        lit("2024-01-08").cast("date"), lit("2024-01-14").cast("date")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(pruned === plain && pruned.nonEmpty)
  }

  /** Per-file (min, max) of an INT64 column, straight from the parquet
    * footers — the statistics the reader's row-group skip runs on.
    */
  private def footerRanges(path: String, column: String): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(path).listFiles
      .filter(f => f.getName.endsWith(".parquet") && f.length > 0).toSeq
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val stats = rd.getFooter.getBlocks.asScala
            .flatMap(_.getColumns.asScala)
            .filter(_.getPath.toDotString == column)
            .map(_.getStatistics)
          (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
            stats.map(_.genericGetMax.asInstanceOf[Long]).max)
        } finally rd.close()
      }
  }

  test("evt_zorder_box: z-curve files carry tight 2-D bounding boxes") {
    val (path, _) = Layout.zorderedEvents(spark, sfDir)
    val users = footerRanges(path, "user_id")
    val days = footerRanges(path, "day_idx")
    assert(users.size >= 4, s"expected several z-run files, got ${users.size}")
    // the pruning property itself: the query box (user 4..7) must be
    // skippable for a strict subset of files on footer stats alone —
    // an unordered write would give every file ~the full user range
    val hit = users.count { case (lo, hi) => hi >= 4L && lo <= 7L }
    assert(hit < users.size,
      s"no file is skippable on user_id stats: ${users.mkString(", ")}")
    // and the boxes are genuinely 2-D-tight: total bounding-box area is
    // well under files × full-grid area (the unordered-layout figure)
    val fullArea = (users.map(_._2).max - users.map(_._1).min + 1).toDouble *
      (days.map(_._2).max - days.map(_._1).min + 1).toDouble
    val area = users.zip(days).map { case ((ul, uh), (dl, dh)) =>
      (uh - ul + 1).toDouble * (dh - dl + 1).toDouble }.sum
    assert(area < 0.8 * users.size * fullArea,
      s"per-file boxes not tighter than unordered: $area vs ${users.size} x $fullArea")
  }

  test("evt_zorder_box: result equals the unordered 2-D predicate") {
    val boxed = Layout.evtZorderBox(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val plain = Tables.events(spark, sfDir)
      .where(col("user_id").between(4, 7) &&
        to_date(col("ts")).between(
          lit("2024-01-08").cast("date"), lit("2024-01-14").cast("date")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("events"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(boxed === plain && boxed.nonEmpty)
  }

  test("evt_bloom_skip: bloom prunes files min/max cannot; result equals plain IN") {
    val idx = Layout.bloomFileIndex(spark, sfDir).collect()
    // range partitioning may leave a couple of planned splits empty —
    // the index covers whatever files exist
    val nFiles = idx.length
    assert(nFiles > Layout.BloomProbeIds.size + 2,
      s"fixture produced too few files ($nFiles) for the pruning claim")
    // min/max footer stats are USELESS on this layout: files cluster
    // users, so every file's event_id box covers every probe id
    val minmaxKept = idx.count { r =>
      Layout.BloomProbeIds.exists(id =>
        r.getAs[Long]("min_id") <= id && id <= r.getAs[Long]("max_id"))
    }
    assert(minmaxKept === nFiles,
      s"expected min/max to keep all $nFiles files, kept $minmaxKept")
    // the bloom index keeps only files actually (or falsely) containing
    // a probe — 5 probes can reach at most 5 true files (+ rare fps)
    val bloomKept =
      Layout.bloomKeptFiles(spark, sfDir, Layout.BloomProbeIds).length
    assert(bloomKept <= Layout.BloomProbeIds.size + 2 && bloomKept < nFiles,
      s"bloom kept $bloomKept of $nFiles")
    // correctness is layout-free: the skipped read equals the plain IN
    val skipped = Layout.evtBloomSkip(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    val plain = Tables.events(spark, sfDir)
      .where(col("event_id").isin(Layout.BloomProbeIds: _*))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(skipped === plain && skipped.size === Layout.BloomProbeIds.size)
  }
}
