// Scale-up probe: multiply the input of the headline operator shapes by
// reading the same parquet K times as ONE multi-path scan (no synthetic
// data), and check wall-clock growth. Linear growth at constant group
// cardinality is the signature of scan-bound work with map-side partial
// aggregation — the property that survives a 100x cluster scale-up;
// superlinear growth would flag a shuffle or driver bottleneck.
//
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//   --jars target/scala-2.13/elasticassetetlpocspark_2.13-0.1.0.jar \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC \
//   --conf spark.sql.legacy.parquet.nanosAsLong=true \
//   -I tools/scale_probe.scala
import org.apache.spark.sql.functions._

val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

// best-of-2: the first execution of a new plan shape pays one-time
// codegen compilation, which would otherwise be misread as data cost
def timed(f: => Unit): Double = {
  def once: Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
  math.min(once, once)
}

def multi(table: String, k: Int) =
  spark.read.parquet(Seq.fill(k)(s"$dir/$table.parquet"): _*)

// warm first-touch + codegen so measured points are steady-state
multi("lineitem", 1).agg(count(lit(1))).head()
multi("events", 1).agg(count(lit(1))).head()

println("== q1 shape (groupBy + decimal agg; map-side combine keeps the shuffle at |groups|) ==")
for (k <- Seq(1, 8, 32)) {
  val li = multi("lineitem", k)
  val s = timed {
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        avg(col("l_discount")).as("avg_disc"), count(lit(1)).as("n"))
      .collect()
  }
  println(f"  k=$k%2d (${600 * k}%6dk rows): $s%6.2f s")
}

println("== sessionize shape (shuffle on user_id + two windows; per-user n log n) ==")
for (k <- Seq(1, 8, 16)) {
  val ev = graft.sources.Tables.eventsFrom(multi("events", k))
  val byUser = org.apache.spark.sql.expressions.Window
    .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
  val s = timed {
    ev.select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("new_session",
        when(col("ts") - lag(col("ts"), 1).over(byUser) <=
          expr("INTERVAL 30 MINUTES"), lit(0)).otherwise(lit(1)))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)), min(col("ts")), max(col("ts")))
      .collect()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== embedding LSH candidate volume (band self-join; candidates ~ C(N,2)*nBands/2^bandBits) ==")
// The scale claim under test: at FIXED corpus size, widening bandBits
// divides candidate volume ~2^Δbits (the collision-rate dial); growing
// the corpus K× grows candidates ~K² at fixed bits, so holding the
// candidate:corpus RATIO constant requires bandBits += log2(K) — the
// reason (numPlanes, bandBits) are operator parameters. Expect the
// 8-bit row ~16x below the 4-bit row, and the 16-bit row near the
// true-near-dup floor.
for (bits <- Seq(4, 8, 16)) {
  val emb = spark.read.parquet(s"$dir/embeddings.parquet")
  val n = emb.count()
  val bands = emb.select(col("vec_id"),
    posexplode(expr(graft.operators.VectorOps.bandKeysExpr(64, bits)))
      .as(Seq("band_idx", "band_key")))
  val a = bands.select(col("vec_id").as("vec_a"), col("band_idx"), col("band_key"))
  val b = bands.select(col("vec_id").as("vec_b"), col("band_idx"), col("band_key"))
  val cand = a.join(b, Seq("band_idx", "band_key"))
    .where(col("vec_a") < col("vec_b"))
    .select("vec_a", "vec_b").distinct().count()
  println(f"  bandBits=$bits%2d: N=$n%6d vectors -> $cand%9d candidate pairs (${cand.toDouble / n}%8.1f per vector)")
}

println("== embedding LSH candidate growth vs corpus size (hash-derived random vectors) ==")
// The companion claim to the bandBits dial above: on random data,
// candidates ~ C(N,2)*nBands/2^bandBits — quadratic in N at FIXED bits,
// restored to ~linear by bandBits += log2(growth). Expect each 4x N row
// at the same bits to show ~16x candidates, and the wider-bits column
// to pull the ratio back down.
graft.plans.GraftExtensions.register(spark)
for (n <- Seq(4000, 16000, 64000); bits <- Seq(8, 16)) {
  val emb = spark.range(n.toLong).select(col("id").as("vec_id"),
    expr("transform(sequence(0, 63), d -> CAST(CAST(hash(id, d) % 1000 AS DOUBLE) / 1000.0 AS FLOAT))")
      .as("embedding"))
  val bands = emb.select(col("vec_id"),
    posexplode(expr(s"sign_bands(embedding, 64, $bits)"))
      .as(Seq("band_idx", "band_key")))
  val a = bands.select(col("vec_id").as("vec_a"), col("band_idx"), col("band_key"))
  val b = bands.select(col("vec_id").as("vec_b"), col("band_idx"), col("band_key"))
  val t0 = System.nanoTime()
  val cand = a.join(b, Seq("band_idx", "band_key"))
    .where(col("vec_a") < col("vec_b"))
    .select("vec_a", "vec_b").distinct().count()
  val secs = (System.nanoTime() - t0) / 1e9
  println(f"  N=$n%6d bandBits=$bits%2d -> $cand%12d candidates (${cand.toDouble / n}%10.1f per vector, $secs%6.2f s)")
}

println("== segment-dedup shape (explode + md5 + count agg + hash join + per-doc rebuild) ==")
// Shape claim: every stage keys on the 128-bit segment hash or doc_id,
// so growth tracks the scan. K-fold input duplicates every doc, which
// flips all segments to boilerplate — semantics are k-degenerate here;
// only the wall-clock shape is under test.
for (k <- Seq(1, 8, 16)) {
  val docs = multi("documents", k)
  val s = timed {
    val base = docs
      .select(col("doc_id"), explode(array(split(col("text"), " "))).as("words"))
      .select(col("doc_id"), posexplode(
        expr("""transform(sequence(0, CAST((size(words) - 1) DIV 10 AS INT)),
                 i -> concat_ws(' ', slice(words, i * 10 + 1, 10)))"""))
        .as(Seq("seg_idx", "seg")))
      .withColumn("seg_hash", md5(col("seg")))
    val freq = base.groupBy(col("seg_hash")).agg(count(lit(1)).as("seg_freq"))
    base.join(freq, Seq("seg_hash"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)), sum(when(col("seg_freq") < 2, 1L).otherwise(0L)))
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== SQ8 asymmetric search vs exact at growing synthetic corpus (re-rank fixed at 4K/query) ==")
// Quality-at-scale claim: midpoint decode keeps the approximate ranking
// aligned with exact cosine as N grows, so the fixed-size shortlist
// keeps recall high while approximate-pass cost grows linearly (and at
// real scale reads 1/4 the bytes). Recall here = |exact top-10 found|/10
// averaged over the query set.
for (n <- Seq(16000, 48000)) {
  val tmp = s"/tmp/probe_sq8_$n"
  spark.range(n.toLong).select(col("id").as("vec_id"),
    expr("transform(sequence(0, 63), d -> CAST(CAST(hash(id, d) % 1000 AS DOUBLE) / 1000.0 AS FLOAT))")
      .as("embedding"), lit(0).as("label"))
    .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
  val tE0 = System.nanoTime()
  val exact = graft.operators.VectorOps.knnExact(spark, tmp)
    .select(col("query_id"), col("neighbor_id")).collect()
  val tE = (System.nanoTime() - tE0) / 1e9
  val tS0 = System.nanoTime()
  val sq8 = graft.operators.VectorOps.knnSq8(spark, tmp)
    .select(col("query_id"), col("neighbor_id")).collect()
  val tS = (System.nanoTime() - tS0) / 1e9
  val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
  val hits = sq8.count(r => exactSet((r.getLong(0), r.getLong(1))))
  val recall = hits.toDouble / exactSet.size
  println(f"  N=$n%6d (|Q|=${n / 100}%4d): exact $tE%6.2f s, sq8 $tS%6.2f s, recall@10 $recall%.3f")
  graft.operators.TextOps.release(spark)
}

println("== PQ ADC search vs exact at growing synthetic corpus (LUT lookups/candidate; re-rank fixed at 8K/query) ==")
// Same harness as the SQ8 probe: the approximate pass of knnPq does
// ZERO float math per candidate (8 LUT lookups against a 6-byte code),
// so its cost is a linear scan of codes; the one-time codebook train +
// encode is memoized (reported separately as 'index').
for (n <- Seq(16000, 48000)) {
  val tmp = s"/tmp/probe_pq_$n"
  spark.range(n.toLong).select(col("id").as("vec_id"),
    expr("transform(sequence(0, 63), d -> CAST(CAST(hash(id, d) % 1000 AS DOUBLE) / 1000.0 AS FLOAT))")
      .as("embedding"), lit(0).as("label"))
    .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
  val tE0 = System.nanoTime()
  val exact = graft.operators.VectorOps.knnExact(spark, tmp)
    .select(col("query_id"), col("neighbor_id")).collect()
  val tE = (System.nanoTime() - tE0) / 1e9
  // index build (codebook + codes), then steady-state search
  val tI0 = System.nanoTime()
  graft.operators.VectorOps.knnPq(spark, tmp)
    .select(col("query_id")).agg(count(lit(1))).head()
  val tI = (System.nanoTime() - tI0) / 1e9
  val tS0 = System.nanoTime()
  val pq = graft.operators.VectorOps.knnPq(spark, tmp)
    .select(col("query_id"), col("neighbor_id")).collect()
  val tS = (System.nanoTime() - tS0) / 1e9
  val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
  val hits = pq.count(r => exactSet((r.getLong(0), r.getLong(1))))
  val recall = hits.toDouble / exactSet.size
  println(f"  N=$n%6d (|Q|=${n / 100}%4d): exact $tE%6.2f s, pq index+search $tI%6.2f s, search $tS%6.2f s, recall@10 $recall%.3f")
  graft.operators.TextOps.release(spark)
}

println("== Binary-quantization Hamming scan vs exact (2 xor+popcnt per candidate; re-rank fixed at 8K/query) ==")
// The 1-bit tier's claim: approximate-pass cost is the cheapest
// possible linear scan (integer ops on 8-byte codes — at real scale
// 1/256 of the bytes), recall holds through the fixed-size re-rank.
// CLUSTERED synthetic (32 centers + noise): sign codes carry no
// magnitude, so an i.i.d.-random corpus (all pairs near-orthogonal,
// Hamming ~32 everywhere) is the adversarial case for EVERY
// direction-only index; real embedding corpora cluster, which is the
// premise this tier (and IVF) is deployed on.
// (n, rr): growing N at fixed re-rank shows the tie-set dilution
// (recall ~ rr*k/|cluster|); widening rr at fixed N restores it — the
// oversample-then-rescore dial every production BQ tier ships.
for ((n, rr) <- Seq((16000, 8), (48000, 8), (48000, 64))) {
  val tmp = s"/tmp/probe_bq_$n"
  spark.range(n.toLong).select(col("id").as("vec_id"),
    expr("""transform(sequence(0, 63), d ->
      CAST(CAST(hash(id % 32 + 7, d) % 1000 AS DOUBLE) / 1000.0
         + CAST(hash(id, d) % 100 AS DOUBLE) / 2000.0 AS FLOAT))""")
      .as("embedding"), lit(0).as("label"))
    .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
  val tE0 = System.nanoTime()
  val exact = graft.operators.VectorOps.knnExact(spark, tmp)
    .select(col("query_id"), col("neighbor_id")).collect()
  val tE = (System.nanoTime() - tE0) / 1e9
  val tI0 = System.nanoTime()
  graft.operators.VectorOps.knnBq(spark, tmp, reRank = rr)
    .select(col("query_id")).agg(count(lit(1))).head()
  val tI = (System.nanoTime() - tI0) / 1e9
  val tS0 = System.nanoTime()
  val bq = graft.operators.VectorOps.knnBq(spark, tmp, reRank = rr)
    .select(col("query_id"), col("neighbor_id")).collect()
  val tS = (System.nanoTime() - tS0) / 1e9
  val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
  val hits = bq.count(r => exactSet((r.getLong(0), r.getLong(1))))
  val recall = hits.toDouble / exactSet.size
  println(f"  N=$n%6d rr=$rr%3d (|Q|=${n / 100}%4d): exact $tE%6.2f s, bq index+search $tI%6.2f s, search $tS%6.2f s, recall@10 $recall%.3f")
  graft.operators.TextOps.release(spark)
}

println("== Label-partitioned filtered ANN at growing corpus (10 labels; candidate floor fixed) ==")
// The nlist sizing rule, measured on the filtered index: at FIXED
// nlist the per-(label, cell) lists grow with N, so the threshold walk
// keeps ~one cell and candidates grow linearly; re-sizing nlist with
// the corpus restores bounded per-query candidate work. Recall is
// against the exact filtered ground truth (knnFiltered).
for ((n, nl) <- Seq((16000, 10), (48000, 10), (48000, 30))) {
  val tmp = s"/tmp/probe_lp_$n"
  spark.range(n.toLong).select(col("id").as("vec_id"),
    expr("""transform(sequence(0, 63), d ->
      CAST(CAST(hash(id % 32 + 7, d) % 1000 AS DOUBLE) / 1000.0
         + CAST(hash(id, d) % 100 AS DOUBLE) / 2000.0 AS FLOAT))""")
      .as("embedding"), expr("CAST(id % 10 AS INT)").as("label"))
    .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
  val tE0 = System.nanoTime()
  val exact = graft.operators.VectorOps.knnFiltered(spark, tmp)
    .select(col("query_id"), col("neighbor_id")).collect()
  val tE = (System.nanoTime() - tE0) / 1e9
  val tI0 = System.nanoTime()
  graft.operators.VectorOps.knnLabelPartitioned(spark, tmp, nlist = nl)
    .select(col("query_id")).agg(count(lit(1))).head()
  val tI = (System.nanoTime() - tI0) / 1e9
  val tS0 = System.nanoTime()
  val lp = graft.operators.VectorOps.knnLabelPartitioned(spark, tmp, nlist = nl)
    .select(col("query_id"), col("neighbor_id")).collect()
  val tS = (System.nanoTime() - tS0) / 1e9
  val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
  val hits = lp.count(r => exactSet((r.getLong(0), r.getLong(1))))
  val recall = hits.toDouble / exactSet.size
  println(f"  N=$n%6d nlist=$nl%2d (|Q|=${n / 100}%4d): exact-filtered $tE%6.2f s, index+search $tI%6.2f s, search $tS%6.2f s, recall@10 $recall%.3f")
  graft.operators.TextOps.release(spark)
}

println("== transitive-closure shape (frontier-dedup BFS over the REAL TPC-H hierarchy: lineitem -> order -> customer -> nation -> region) ==")
// the asset graph is 19 pairs at any sf, so the closure probe derives a
// genuinely growing DAG from the data itself: 4 levels, ~765k edges and
// ~2.9M reachable pairs at sf0.1 — ~150,000x the asset fixture. Same
// loop as GraphOps.assetClosure (anti-join frontier dedup, per-round
// localCheckpoint, empty-frontier termination).
for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
  def t(name: String) = spark.read.parquet(s"/root/testdata/$sf/$name.parquet")
  val up = t("lineitem").select(
      concat(lit("li:"), col("l_orderkey"), lit(":"), col("l_linenumber")).as("src"),
      concat(lit("o:"), col("l_orderkey")).as("dst"))
    .union(t("orders").select(concat(lit("o:"), col("o_orderkey")).as("src"),
      concat(lit("c:"), col("o_custkey")).as("dst")))
    .union(t("customer").select(concat(lit("c:"), col("c_custkey")).as("src"),
      concat(lit("n:"), col("c_nationkey")).as("dst")))
    .union(t("nation").select(concat(lit("n:"), col("n_nationkey")).as("src"),
      concat(lit("r:"), col("n_regionkey")).as("dst")))
    .localCheckpoint()
  val nEdges = up.count()
  var pairs = 0L
  val s = timed {
    var reached = up.withColumn("depth", lit(1L)).localCheckpoint()
    var frontier = reached
    var depth = 1L
    while (depth < 10 && !frontier.isEmpty) {
      depth += 1
      val fresh = frontier.alias("a")
        .join(up.alias("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .distinct()
        .join(reached, Seq("src", "dst"), "left_anti")
        .withColumn("depth", lit(depth))
        .localCheckpoint()
      reached = reached.unionAll(fresh).localCheckpoint()
      frontier = fresh
    }
    pairs = reached.count()
  }
  println(f"  $sf%8s: edges=$nEdges%8d pairs=$pairs%9d $s%6.2f s")
}

println("== incremental closure maintenance vs delta size (same TPC-H-derived DAG; cost should track |delta|, not |closure|) ==")
// The O(delta) claim under test: GraphOps.incrementalClosure's
// relaxation joins key on the NEW edges' endpoints and its merge is
// anti-join + union (never a full-closure re-aggregation), so
// maintaining the closure after a 1% edge arrival should cost a small
// fraction of the full batch rebuild (the sf row above), and grow with
// the delta, not with the accumulated closure.
{
  def upOf(sf: String) = {
    def t(name: String) = spark.read.parquet(s"/root/testdata/$sf/$name.parquet")
    t("lineitem").select(
        concat(lit("li:"), col("l_orderkey"), lit(":"), col("l_linenumber")).as("src"),
        concat(lit("o:"), col("l_orderkey")).as("dst"))
      .union(t("orders").select(concat(lit("o:"), col("o_orderkey")).as("src"),
        concat(lit("c:"), col("o_custkey")).as("dst")))
      .union(t("customer").select(concat(lit("c:"), col("c_custkey")).as("src"),
        concat(lit("n:"), col("c_nationkey")).as("dst")))
      .union(t("nation").select(concat(lit("n:"), col("n_nationkey")).as("src"),
        concat(lit("r:"), col("n_regionkey")).as("dst")))
      .localCheckpoint()
  }
  val up = upOf("sf0.1")
  def bfs(edges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    var reached = edges.withColumn("depth", lit(1L)).localCheckpoint()
    var frontier = reached
    var depth = 1L
    while (depth < 10 && !frontier.isEmpty) {
      depth += 1
      val fresh = frontier.alias("a")
        .join(edges.alias("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .distinct()
        .join(reached, Seq("src", "dst"), "left_anti")
        .withColumn("depth", lit(depth))
        .localCheckpoint()
      reached = reached.unionAll(fresh).localCheckpoint()
      frontier = fresh
    }
    reached.select(col("src").as("asset_ean"), col("dst").as("reached_ean"), col("depth"))
  }
  for (pct <- Seq(1, 5, 20)) {
    val split = abs(hash(col("src"), col("dst"))) % 100
    val init = up.where(split >= pct).localCheckpoint()
    val delta = up.where(split < pct).localCheckpoint()
    val prev = bfs(init).localCheckpoint()
    val prevPairs = prev.count()
    val nDelta = delta.count()
    var pairs = 0L
    val s = timed {
      pairs = graft.operators.GraphOps.incrementalClosure(prev, delta).count()
    }
    println(f"  delta=$pct%2d%% ($nDelta%7d of ${nDelta + init.count()}%8d edges, prev pairs=$prevPairs%9d): incr -> $pairs%9d pairs in $s%6.2f s")
  }
  // The decisive experiment for the O(delta) claim: hold the delta at a
  // FIXED absolute size (~770 edges) while the base closure grows 10x.
  // If maintenance cost tracks the delta, the two rows read ~equal
  // while the full-rebuild rows above grow with the graph.
  println("== incremental closure: FIXED ~770-edge delta, growing base ==")
  for (sf <- Seq("sf0.01", "sf0.1")) {
    val u = upOf(sf)
    val nAll = u.count()
    val cut = math.max(1L, math.round(1000.0 * 770.0 / nAll))
    val split = abs(hash(col("src"), col("dst"))) % 1000
    val init = u.where(split >= cut).localCheckpoint()
    val delta = u.where(split < cut).localCheckpoint()
    val prev = bfs(init).localCheckpoint()
    val prevPairs = prev.count()
    val nDelta = delta.count()
    var pairs = 0L
    val s = timed {
      pairs = graft.operators.GraphOps.incrementalClosure(prev, delta).count()
    }
    println(f"  $sf%8s: base=$prevPairs%9d pairs, delta=$nDelta%5d edges: incr -> $pairs%9d pairs in $s%6.2f s")
  }
}

println("== pagerank shape (edge-derivation scan x k over a FIXED 25-node graph; 5 integer-grid rounds) ==")
// multi-reading lineitem scales the scan and the edge WEIGHTS while the
// nation node set stays fixed — at web scale the node set grows too and
// the broadcast rank join flips to a keyed shuffle (same plan shape);
// what this probe demonstrates is that the derivation scan dominates
// and the iteration cost is O(nodes + edges), independent of k
for (k <- Seq(1, 8, 16)) {
  val e0 = multi("lineitem", k).select(col("l_orderkey"), col("l_suppkey"))
    .join(multi("orders", 1).select(col("o_orderkey"), col("o_custkey")),
      col("l_orderkey") === col("o_orderkey"))
    .join(broadcast(multi("customer", 1).select(col("c_custkey"), col("c_nationkey"))),
      col("o_custkey") === col("c_custkey"))
    .join(broadcast(multi("supplier", 1).select(col("s_suppkey"), col("s_nationkey"))),
      col("l_suppkey") === col("s_suppkey"))
    .groupBy(col("c_nationkey").cast("long").as("src"),
      col("s_nationkey").cast("long").as("dst"))
    .agg(count(lit(1)).as("w"))
  val s = timed {
    val wout = e0.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val edges = e0.join(wout, Seq("src")).localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    var pr = nodes.withColumn("pr", lit(1000000000L))
    for (_ <- 1 to 5) {
      val contrib = edges
        .join(broadcast(pr), col("src") === col("node"))
        .select(col("dst"), expr("(pr * 85 * w) div (100 * wout)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      pr = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(150000000L) + coalesce(col("contrib"), lit(0L))).as("pr"))
        .localCheckpoint()
    }
    pr.agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== minhash signature shape (explode + digest + partial-min agg; shuffle = |docs| x 9 longs) ==")
for (k <- Seq(1, 8, 16)) {
  val docs = multi("documents", k)
  val s = timed {
    docs.withColumn("words", split(col("text"), " "))
      .withColumn("shingles", when(size(col("words")) >= 3,
        expr("transform(sequence(0, size(words) - 3), i -> concat_ws(' ', slice(words, i + 1, 3)))"))
        .otherwise(expr("CAST(array() AS array<string>)")))
      .select(col("doc_id"), explode(col("shingles")).as("sg"))
      .select(col("doc_id"), md5(col("sg")).as("h"))
      .groupBy(col("doc_id"))
      .agg(min(expr("CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT)")))
      .agg(count(lit(1)))
      .head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

// shared gram pipeline for the overlap/novelty probes below (the
// withShingles -> md5 -> 60-bit hash shape of TextOps). Brace-wrapped:
// the REPL's leading-dot continuation would otherwise bind the chain
// to the previous result instead of the def body.
def gramsOf(docs: org.apache.spark.sql.DataFrame, key: String) = {
  docs.withColumn("words", split(col("text"), " "))
    .withColumn("shingles", when(size(col("words")) >= 3,
      expr("transform(sequence(0, size(words) - 3), i -> concat_ws(' ', slice(words, i + 1, 3)))"))
      .otherwise(expr("CAST(array() AS array<string>)")))
    .select(col(key), explode(col("shingles")).as("sg"))
    .select(col(key), md5(col("sg")).as("h"))
    .select(col(key), expr("CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT)").as("gh"))
    .distinct()
}

println("== source-overlap shape (distinct (source, gram-hash) + gram-keyed self-join; pairs per gram <= S^2) ==")
// k-fold duplication grows the SCAN k x while the distinct gram set is
// unchanged — cost should track the scan (partial distinct absorbs
// duplicates map-side); the S^2-bounded output is k-independent.
for (k <- Seq(1, 8, 16)) {
  val s = timed {
    val grams = gramsOf(multi("documents", k), "source")
    grams.select(col("source").as("src_a"), col("gh"))
      .join(grams.select(col("source").as("src_b"), col("gh")), Seq("gh"))
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)))
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== source-overlap growth vs DISTINCT gram volume (synthetic unique grams: the corpus-wide distinct is the honest cost) ==")
// the r7 verdict flagged this distinct as the row to watch: unique-gram
// volume grows with a REAL corpus, so generate it — n docs x 18 unique
// shingles each. Expect ~linear wall growth in n (one hash-keyed
// shuffle of 8-byte keys; per-gram pair fan-out bounded by S=8).
for (n <- Seq(20000, 80000, 320000)) {
  val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
    concat(lit("s"), col("id") % 8).as("source"),
    expr("concat_ws(' ', transform(sequence(0, 19), i -> conv(CAST(abs(hash(id, i)) AS STRING), 10, 36)))")
      .as("text"))
  val s = timed {
    val grams = gramsOf(docs, "source")
    grams.select(col("source").as("src_a"), col("gh"))
      .join(grams.select(col("source").as("src_b"), col("gh")), Seq("gh"))
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)))
      .agg(count(lit(1))).head()
  }
  println(f"  n=$n%7d docs (~${n * 18 / 1000}%6dk distinct grams): $s%6.2f s")
}

println("== novelty shape (gram-keyed frequency shuffle + join back on the SAME key; only hashes and doc ids shuffle) ==")
// k-fold duplication: every gram's corpus frequency multiplies, so
// novelty semantics are k-degenerate here (like the segment-dedup
// probe) — the wall-clock shape is what's under test, and the distinct
// (doc_id, gram) set is k-invariant, so cost should track the scan.
for (k <- Seq(1, 8, 16)) {
  val s = timed {
    val grams = gramsOf(multi("documents", k), "doc_id")
    val freq = grams.groupBy(col("gh")).agg(count(lit(1)).as("gram_docs"))
    grams.join(freq, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)), sum(when(col("gram_docs") === 1, 1L).otherwise(0L)))
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== CMS sketch shape (fixed 4x2048 grid; exchange = |tasks| x grid, key-cardinality independent) ==")
graft.plans.GraftExtensions.register(spark)
// scan growth: k-fold events through one corpus-wide sketch agg
for (k <- Seq(1, 8, 32)) {
  val ev = multi("events", k)
  val s = timed { ev.agg(expr("cms_sketch(user_id, 4, 2048)")).head() }
  println(f"  k=$k%2d (${150 * k}%5dk rows): $s%6.2f s")
}
// cardinality independence: fixed 20M rows, distinct keys 1e3 -> 1e8;
// an exact groupBy count would shuffle |keys| rows, the sketch always
// ships the same 64KB grid per task
for (card <- Seq(1000L, 1000000L, 100000000L)) {
  val rows = spark.range(20000000L).select((col("id") % card).as("k"))
  val s = timed { rows.agg(expr("cms_sketch(k, 4, 2048)")).head() }
  println(f"  distinct-keys=$card%10d (20M rows): $s%6.2f s")
}

println("== SemDeDup shape (candidates share a trained IVF cluster; per-cluster pairs ~ (N/nlist)^2 — nlist is the dial that must grow with N) ==")
// Expect the 32k/nlist=10 row ~16x the 8k/nlist=10 row (quadratic at
// FIXED nlist — the documented degenerate setting) and the 32k/nlist=40
// row pulled back ~4x from it: scaling nlist with N restores the
// linear-ish per-cluster budget, which is how a real deployment sizes
// it (nlist ~ sqrt(N)).
for ((n, nlist) <- Seq((8000, 10), (32000, 10), (32000, 40))) {
  val tmp = s"/tmp/probe_semdedup_${n}_$nlist"
  spark.range(n.toLong).select(col("id").as("vec_id"),
    expr("transform(sequence(0, 63), d -> CAST(CAST(hash(id, d) % 1000 AS DOUBLE) / 1000.0 AS FLOAT))")
      .as("embedding"),
    (col("id") % nlist).cast("int").as("label"))
    .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
  val s = timed {
    graft.operators.VectorOps.semDedup(spark, tmp, nlist)
      .agg(count(lit(1)), sum(col("is_dup"))).head()
  }
  println(f"  N=$n%6d nlist=$nlist%3d: $s%6.2f s")
  graft.operators.TextOps.release(spark)
}

println("== HLL register file (fixed 2^12 registers; exchange = |tasks| x 32KB, key-cardinality independent like CMS) ==")
for (card <- Seq(1000L, 1000000L, 100000000L)) {
  val rows = spark.range(20000000L).select((col("id") % card).as("k"))
  val s = timed { rows.agg(expr("hll_sketch(k, 12)")).head() }
  println(f"  distinct-keys=$card%10d (20M rows): $s%6.2f s")
}

println("== BM25 shape (tf explode -> broadcast semi-join on query terms -> partial-agg; only matching terms shuffle) ==")
// k-fold docs: the posting explode grows k-fold but the semi-join cuts
// it to query-term matches before the exchange; expect ~linear scan cost
for (k <- Seq(1, 8, 16)) {
  val docs = multi("documents", k)
    .withColumn("doc_id", monotonically_increasing_id())
  val qterms = Seq("data", "the", "model").toDF("term")
  val s = timed {
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .join(broadcast(qterms), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .join(dl, Seq("doc_id"))
      .agg(count(lit(1)), sum(col("tf") * col("dl"))).head()
  }
  println(f"  k=$k%2d (${500 * k}%5d docs base x sf-mult): $s%6.2f s")
}

println("== sig_terms shape (distinct (doc,term,source) explode -> fg/bg partial aggs -> term-keyed join -> per-source WindowGroupLimit) ==")
// k-fold docs with fresh ids: distinct pairs, fg and bg all grow k-fold
// but (term, source) group cardinality is CONSTANT, so the join and
// window stay vocabulary-sized; expect ~linear scan/distinct cost
for (k <- Seq(1, 8, 16)) {
  val docs = multi("documents", k)
    .withColumn("doc_id", monotonically_increasing_id())
  val s = timed {
    val dt = docs
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("term"))
      .distinct()
    val fg = dt.groupBy(col("source"), col("term")).agg(count(lit(1)).as("fg"))
    val bg = dt.groupBy(col("term")).agg(count(lit(1)).as("bg"))
    val fgTotals = docs.groupBy(col("source")).agg(count(lit(1)).as("fg_total"))
    val nDocs = docs.agg(count(lit(1)).as("bg_total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("jlh").desc, col("term").asc)
    fg.join(bg, Seq("term"))
      .join(broadcast(fgTotals), Seq("source"))
      .crossJoin(broadcast(nDocs))
      .withColumn("fg_pct", col("fg").cast("double") / col("fg_total").cast("double"))
      .withColumn("bg_pct", col("bg").cast("double") / col("bg_total").cast("double"))
      .withColumn("jlh", (col("fg_pct") - col("bg_pct")) * (col("fg_pct") / col("bg_pct")))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d (${500 * k}%5d docs base x sf-mult): $s%6.2f s")
}

println("== hybrid RRF fusion shape (two top-k rank lists full-outer-joined per (query,doc) -> integer-grid fuse -> per-query window; cost must track |Q|, not corpus) ==")
// the two subsystems (BM25, exact kNN) carry their own probes above /
// below; what fusion adds is k*|Q|-row small-data work. Grow |Q| 4x by
// tightening the query stride — expect ~flat-to-linear in |Q| with the
// corpus fixed
for (qmod <- Seq(100, 50, 25)) {
  val docs = multi("documents", 1)
  val s = timed {
    // stand-in ranked lists at the real per-query width: top-10 docs
    // per query from a deterministic hash order (the fusion consumes
    // ONLY (query, doc, rank) — its cost does not depend on how the
    // lists were ranked)
    val w0 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("h").asc, col("doc_id").asc)
    def ranked(salt: String) = docs
      .select(col("doc_id"))
      .crossJoin(broadcast(docs.select(col("doc_id").as("query_id"))
        .where(col("query_id") % qmod === 0)))
      .select(col("query_id"), col("doc_id"),
        expr(s"CAST(conv(substring(md5(concat_ws(':', '$salt', query_id, doc_id)), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .withColumn("rank", row_number().over(w0)).where(col("rank") <= 10)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val lex = ranked("lex").withColumnRenamed("rank", "lex_rank")
    val vec = ranked("vec").withColumnRenamed("rank", "vec_rank")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rrf_score").desc, col("doc_id").asc)
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(expr("1099511627776 div (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1099511627776 div (60 + vec_rank)"), lit(0L)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
      .agg(count(lit(1))).head()
  }
  println(f"  qmod=$qmod%3d (|Q| x${100 / qmod}%d): $s%6.2f s")
}

println("== bottom-k-by-hash sampling shape (q50: rank<=k window -> partial WindowGroupLimit cuts each map task to k rows/group) ==")
for (k <- Seq(1, 8, 32)) {
  val ev = graft.sources.Tables.eventsFrom(multi("events", k))
  val w = org.apache.spark.sql.expressions.Window
    .partitionBy(col("event_type")).orderBy(col("h").asc, col("event_id").asc)
  val s = timed {
    ev.select(col("event_type"), col("event_id"), col("value"),
      expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 256)
      .groupBy(col("event_type")).agg(count(lit(1)), sum(col("value"))).collect()
  }
  println(f"  k=$k%2d (${150 * k}%5dk rows): $s%6.2f s")
}

println("== weighted-sample shape (q49: <=8x unit explode -> per-item partial min -> WindowGroupLimit top-k) ==")
for (k <- Seq(1, 8, 16)) {
  val ev = graft.sources.Tables.eventsFrom(multi("events", k))
  val w = org.apache.spark.sql.expressions.Window
    .partitionBy(col("event_type")).orderBy(col("mk").asc, col("event_id").asc)
  val s = timed {
    ev.select(col("event_type"), col("event_id"),
      least(lit(8L), lit(1L) + floor(col("value") / 64.0d).cast("long")).as("weight"))
      .select(col("event_type"), col("event_id"), explode(expr("sequence(1L, weight)")).as("r"))
      .select(col("event_type"), col("event_id"),
        expr("CAST(conv(substring(md5(concat_ws(':', event_id, r)), 1, 15), 16, 10) AS BIGINT)").as("uk"))
      .groupBy(col("event_type"), col("event_id")).agg(min(col("uk")).as("mk"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d (${150 * k}%5dk rows): $s%6.2f s")
}

println("== transitions shape (user-keyed lag window -> |types|^2 partial agg; sessions small so per-user sort is bounded) ==")
for (k <- Seq(1, 8, 16)) {
  val ev = graft.sources.Tables.eventsFrom(multi("events", k))
  val w = org.apache.spark.sql.expressions.Window
    .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
  val s = timed {
    ev.select(col("user_id"), col("event_type"),
      lag(col("event_type"), 1).over(w).as("prev_type"))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type")).agg(count(lit(1)))
      .collect()
  }
  println(f"  k=$k%2d (${150 * k}%5dk rows): $s%6.2f s")
}

println("== chunking shape (pure per-row Generate; zero exchanges — cost IS the scan) ==")
for (k <- Seq(1, 8, 32)) {
  val docs = multi("documents", k)
  val s = timed {
    docs.select(col("doc_id"), explode(array(split(col("text"), " "))).as("words"))
      .select(col("doc_id"), size(col("words")).cast("long").as("n"), col("words"))
      .select(col("doc_id"), col("n"), posexplode(expr(
        "transform(sequence(0, CAST(ceil(n / 24.0D) AS INT) - 1), i -> array_join(slice(words, i * 24 + 1, 32), ' '))"))
        .as(Seq("chunk_id", "chunk_text")))
      .select(md5(col("chunk_text")).as("h"))
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d (${500 * k}%6d docs base x sf-mult): $s%6.2f s")
}

println("== containment shape (5-gram rare-shingle blocking, the shipped design: df-capped inverted index; high-df shingles generate ZERO pairs) ==")
// k-fold duplication multiplies every shingle's df by k, so the df cap
// progressively BLOCKS shingles — the semantics are k-degenerate (like
// the novelty probe) but the wall-clock shows exactly the scale claim:
// candidate work is bounded by the df cap, not by corpus size, so cost
// tracks the scan while a capless inverted-index join would grow k^2.
// Width 5 mirrors TextOps.ContainBlockWidth (3-gram blocking saturates
// this corpus's 31-word vocabulary: 1.04M candidate pairs vs 1,460).
for (k <- Seq(1, 8, 16)) {
  val s = timed {
    val blocks = multi("documents", k)
      .select(col("doc_id"), explode(array(split(col("text"), " "))).as("words"))
      .where(size(col("words")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(words) - 5), i -> concat_ws(' ', slice(words, i + 1, 5)))")).as("sg"))
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(sg), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .distinct()
    val rare = blocks.join(
      blocks.groupBy(col("h")).agg(count(lit(1)).as("df")).where(col("df") <= 16), Seq("h"))
    rare.select(col("h"), col("doc_id").as("a"))
      .join(rare.select(col("h"), col("doc_id").as("b")), Seq("h"))
      .where(col("a") < col("b")).distinct()
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d (${500 * k}%6d docs base x sf-mult): $s%6.2f s")
}

println("== rolling-distinct shape (observation x7 day fan-out -> equi-keyed partial agg; no range join) ==")
for (k <- Seq(1, 8, 16)) {
  val ev = graft.sources.Tables.eventsFrom(multi("events", k))
  val s = timed {
    val obs = ev.select(col("event_type"), to_date(col("ts")).as("day"), col("user_id")).distinct()
    obs.select(col("event_type"), col("user_id"),
      explode(expr("sequence(day, date_add(day, 6))")).as("day"))
      .join(obs.select(col("event_type"), col("day")).distinct(),
        Seq("event_type", "day"), "left_semi")
      .groupBy(col("event_type"), col("day"))
      .agg(countDistinct(col("user_id")))
      .collect()
  }
  println(f"  k=$k%2d (${150 * k}%5dk rows): $s%6.2f s")
}

println("== rolling-HLL shape (per-day register files, LIVE registers x7 fan-out; per-cell flow bounded by min(2^p, daily distinct)) ==")
for (k <- Seq(1, 8, 16)) {
  val ev = graft.sources.Tables.eventsFrom(multi("events", k))
  val s = timed {
    val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch(user_id, 12)").as("regs"))
    daily.select(col("event_type"), col("regs"),
      explode(expr("sequence(day, date_add(day, 6))")).as("wday"))
      .select(col("event_type"), col("wday").as("day"),
        posexplode(col("regs")).as(Seq("bucket", "r")))
      .where(col("r") > 0L)
      .join(daily.select(col("event_type"), col("day")).distinct(),
        Seq("event_type", "day"), "left_semi")
      .groupBy(col("event_type"), col("day"), col("bucket"))
      .agg(max(col("r")))
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d (${150 * k}%5dk rows): $s%6.2f s")
}

println("== triangle shape (degree-ordered orientation over a FIXED 25-node graph; edge-derivation scan x k dominates, like pagerank) ==")
for (k <- Seq(1, 8, 16)) {
  val li = multi("lineitem", k)
  val s = timed {
    val e = li.select(col("l_orderkey"), col("l_suppkey"))
      .join(broadcast(multi("orders", 1).select(col("o_orderkey"), col("o_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(multi("customer", 1).select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(multi("supplier", 1).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey")).cast("long").as("a"),
        greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("b"))
      .distinct()
    val und = e
    val wedges = und.select(col("a").as("u"), col("b").as("v"))
      .join(und.select(col("a").as("u"), col("b").as("w")), Seq("u"))
      .where(col("v") < col("w"))
    wedges.join(und.select(col("a").as("v"), col("b").as("w")), Seq("v", "w"), "left_semi")
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d (${600 * k}%6dk lineitems): $s%6.2f s")
}

println("== star-contraction CC on PATH graphs (diameter n-1; rounds must grow ~log n, NOT ~n — min-label propagation would pay n-1 rounds) ==")
for (n <- Seq(2000, 20000, 100000)) {
  val pairs = spark.range(n - 1L).select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
  val edges = pairs.unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
  val t0 = System.nanoTime()
  val (labels, rounds) = graft.operators.GraphOps.starContract(edges)
  val onRoot = labels.where(col("label") === 0).count()
  val s = (System.nanoTime() - t0) / 1e9
  println(f"  n=$n%7d (diameter ${n - 1}%7d): $s%6.2f s, $rounds%2d rounds, $onRoot%7d/$n nodes on label 0")
}

println("== fuzzy-join shape (band equi-join with the side predicate in the candidate stream; cost tracks collisions, never |A|x|B|) ==")
// synthetic: n docs, ~n/50 planted cross-side dup pairs; band keys stand
// in for minhash bands (the real operator's keys are 3-minima strings).
for (n <- Seq(20000, 80000, 320000)) {
  val docs = spark.range(n.toLong).select(col("id").as("doc_id"),
    (col("id") % 2).as("side"),
    // ~n/50 planted duplicate band-key groups; everything else unique
    when(col("id") % 50 === 0, concat(lit("dup"), col("id") % 400))
      .otherwise(concat(lit("u"), col("id"))).as("content"))
  val s = timed {
    val bands = docs.select(col("doc_id"), col("side"),
      explode(expr("transform(sequence(0, 2), b -> md5(concat(content, CAST(b AS STRING))))")).as("band_key"))
    val l = bands.where(col("side") === 0)
      .select(col("doc_id").as("left_id"), col("band_key"))
    val r = bands.where(col("side") === 1)
      .select(col("doc_id").as("right_id"), col("band_key"))
    l.join(r, Seq("band_key"))
      .select(col("left_id"), col("right_id")).distinct()
      .agg(count(lit(1))).head()
  }
  println(f"  n=$n%7d docs: $s%6.2f s")
}

println("== dup-span shape (stride-1 window hash -> freq agg -> join -> per-doc islands window; shuffle = (doc,start,hash), never text) ==")
for (k <- Seq(1, 4, 8)) {
  val s = timed {
    val w = 5
    val base = multi("documents", k)
      .select(col("doc_id"), explode(array(split(col("text"), " "))).as("words"))
      .select(col("doc_id"), posexplode(expr(
        s"CASE WHEN size(words) >= $w THEN transform(sequence(0, size(words) - $w), i -> concat_ws(' ', slice(words, i + 1, $w))) ELSE CAST(array() AS array<string>) END"))
        .as(Seq("start", "win")))
      .select(col("doc_id"), col("start"), md5(col("win")).as("h"))
    val dup = base.groupBy(col("h")).agg(count(lit(1)).as("f")).where(col("f") >= 2)
    val byStart = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("start"))
    base.join(dup, Seq("h")).select(col("doc_id"), col("start"))
      .withColumn("prev", lag(col("start"), 1).over(byStart))
      .withColumn("grp", sum(when(col("prev").isNull || col("start") - col("prev") > w, 1L).otherwise(0L)).over(byStart))
      .groupBy(col("doc_id"), col("grp")).agg(min(col("start")), max(col("start")))
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== k-center FPS (10 sequential corpus passes, broadcast 1-row pick, per-step scalar collect; wall must track k*N) ==")
for (n <- Seq(16000, 48000)) {
  val dim = 64
  val vecs = spark.range(n.toLong).select(col("id").as("vec_id"),
    expr(s"transform(sequence(0, ${dim - 1}), j -> CAST(hash(id, j) % 1000 AS FLOAT) / 1000.0)").as("embedding"))
    .select(col("vec_id"), col("embedding"),
      expr("aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("nrm"))
    .localCheckpoint()
  val t0 = System.nanoTime()
  var d = vecs.withColumn("d", lit(2.0))
  for (t <- 1 to 10) {
    val top = d.orderBy(col("d").desc, col("vec_id").asc).limit(1)
      .select(col("vec_id")).head().getLong(0)
    if (t < 10) {
      val pv = broadcast(vecs.where(col("vec_id") === top)
        .select(col("embedding").as("pv"), col("nrm").as("pnrm")))
      d = d.crossJoin(pv).select(col("vec_id"), col("embedding"), col("nrm"),
        least(col("d"), lit(1.0) -
          expr("aggregate(zip_with(embedding, pv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)") /
          (sqrt(col("nrm")) * sqrt(col("pnrm")))).as("d")).localCheckpoint(true)
    }
  }
  val s = (System.nanoTime() - t0) / 1e9
  println(f"  n=$n%6d vectors: $s%6.2f s (10 picks)")
}

println("== k-core shape (edge-derivation scan x k over the FIXED 25-node graph; 8 peeling rounds of tiny aggregates — the pagerank/triangle cost profile) ==")
for (k <- Seq(1, 8, 16)) {
  val li = multi("lineitem", k)
  val s = timed {
    val e = li.select(col("l_orderkey"), col("l_suppkey"))
      .join(broadcast(multi("orders", 1).select(col("o_orderkey"), col("o_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(multi("customer", 1).select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(multi("supplier", 1).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(least(col("c_nationkey"), col("s_nationkey")).cast("long").as("a"),
        greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("b"))
      .agg(count(lit(1)).as("w"))
    val th = e.agg(expr("percentile(w, 0.75)").as("t"))
    var cur = e.crossJoin(broadcast(th)).where(col("w").cast("double") >= col("t"))
      .select(col("a"), col("b")).localCheckpoint(true)
    for (_ <- 1 to 8) {
      val keep = cur.select(col("a").as("node")).unionAll(cur.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= 5).select(col("node"))
      cur = cur.join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
        .localCheckpoint(true)
    }
    cur.agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d (${600 * k}%6dk lineitems): $s%6.2f s")
}

println("== DSIR shape (token explode -> (doc,word) partial-count agg -> vocab groupBy OFF it -> word-keyed join back) ==")
for (k <- Seq(1, 8, 16)) {
  val s = timed {
    val tf = multi("documents", k)
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id"), col("lang"), col("word")).agg(count(lit(1)).as("tf"))
    val ws = tf.groupBy(col("word")).agg(
      sum(when(col("lang") === "en", col("tf")).otherwise(0L)).as("ct"),
      sum(when(col("lang") =!= "en", col("tf")).otherwise(0L)).as("cs"))
    val tot = ws.agg(sum(col("ct")).as("tt"), sum(col("cs")).as("ss"))
    val scored = ws.crossJoin(broadcast(tot))
      .select(col("word"), ((length(bin(col("ss"))) - length(bin(col("cs") + 1))) -
        (length(bin(col("tt"))) - length(bin(col("ct") + 1)))).as("wbits"))
    tf.join(scored, Seq("word")).groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("wbits")), sum(col("tf")))
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}
println("== MMR re-rank shape (exact kNN -> k^2 x |Q| pair table; cost tracks |Q| at fixed corpus, k^2 fixed) ==")
// the 5 greedy steps run over the CACHED k^2·|Q| pair table; what grows
// with the workload is the kNN + pair-table construction probed here.
for (qmod <- Seq(100, 50, 25)) {
  val s = timed {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        expr(graft.operators.VectorOps.dot("embedding", "embedding")).as("nrm"))
    val q = vecs.where(col("vec_id") % qmod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("nrm").as("qnrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
    val cands = vecs.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (expr(graft.operators.VectorOps.dot("embedding", "qv")) /
          (sqrt(col("nrm")) * sqrt(col("qnrm")))).as("sim"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("sim").as("rel"))
    val pairs = cands.select(col("query_id"), col("doc_id").as("a"))
      .join(cands.select(col("query_id"), col("doc_id").as("b")), Seq("query_id"))
      .where(col("a") =!= col("b"))
      .join(vecs.select(col("vec_id").as("a"), col("embedding").as("ea"), col("nrm").as("na")), Seq("a"))
      .join(vecs.select(col("vec_id").as("b"), col("embedding").as("eb"), col("nrm").as("nb")), Seq("b"))
      .select(col("query_id"), col("a"), col("b"),
        (expr(graft.operators.VectorOps.dot("ea", "eb")) / (sqrt(col("na")) * sqrt(col("nb")))).as("psim"))
    pairs.agg(count(lit(1)), sum(col("psim"))).head()
  }
  println(f"  qmod=$qmod%3d (|Q| x${100 / qmod}%d): $s%6.2f s")
}

println("== embCuration at growing N (semDedup + per-cluster sample window; nlist is the documented dial) ==")
for ((n, nlist) <- Seq((8000, 10), (64000, 10), (64000, 28))) {
  val tmp = s"/tmp/probe_embcur_${n}_$nlist"
  spark.range(n.toLong).select(col("id").as("vec_id"),
    expr("transform(sequence(0, 63), d -> CAST(CAST(hash(id, d) % 1000 AS DOUBLE) / 1000.0 AS FLOAT))")
      .as("embedding"),
    (col("id") % nlist).cast("int").as("label"))
    .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
  val s = timed {
    graft.operators.VectorOps.embCuration(spark, tmp, nlist)
      .agg(count(lit(1)), sum(col("kept")), sum(col("is_dup"))).head()
  }
  println(f"  N=$n%6d nlist=$nlist%3d: $s%6.2f s")
  graft.operators.TextOps.release(spark)
}

println("== keyset page fetch at growing depth vs offset pagination (the q53-vs-q52 claim, measured) ==")
// given the cursor (the previous page's last key - computed OUTSIDE the
// timer), the keyset fetch is filter + TakeOrdered(pagesize): depth-flat.
// The offset fetch must rank/skip depth rows every time: grows with depth.
{
  val c = multi("customer", 16).select(col("c_custkey"), col("c_name"), col("c_acctbal"))
  c.agg(count(lit(1))).head()
  for (depth <- Seq(250, 2500, 25000)) {
    val cur = c.orderBy(col("c_acctbal").desc, col("c_custkey").asc).limit(depth)
      .agg(min(struct(col("c_acctbal"), (-col("c_custkey")).as("negkey"))).as("b"))
      .select(col("b.c_acctbal").as("ba"), (-col("b.negkey")).as("bk")).head()
    val (ba, bk) = (cur.getDouble(0), cur.getLong(1))
    val sKey = timed {
      c.where(col("c_acctbal") < ba ||
          (col("c_acctbal") === ba && col("c_custkey") > bk))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc).limit(10)
        .collect()
    }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val sOff = timed {
      c.withColumn("rn", row_number().over(w))
        .where(col("rn") > depth && col("rn") <= depth + 10)
        .collect()
    }
    println(f"  depth=$depth%6d: keyset $sKey%6.2f s, offset $sOff%6.2f s")
  }
}

println("== BPE training shape (word-freq agg scans the corpus x k; 8 rounds run over the FIXED type dictionary) ==")
for (k <- Seq(1, 8, 16)) {
  val s = timed {
    val wf = multi("documents", k)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    var toks = wf.select(col("f"), expr(
      """CASE WHEN length(w) = 0 THEN CAST(array() AS array<string>)
        |     ELSE transform(sequence(1, length(w)), i -> substring(w, i, 1)) END""".stripMargin).as("toks"))
      .localCheckpoint(true)
    for (r <- 1 to 8) {
      val pairs = toks.select(col("f"), explode(expr(
        """CASE WHEN size(toks) >= 2
          |     THEN transform(sequence(1, size(toks) - 1),
          |       i -> named_struct('a', element_at(toks, i), 'b', element_at(toks, i + 1)))
          |     ELSE CAST(array() AS array<struct<a: string, b: string>>) END""".stripMargin)).as("p"))
        .select(col("f"), col("p.a").as("a"), col("p.b").as("b"))
      val best = pairs.where(col("a") =!= col("b"))
        .groupBy(col("a"), col("b")).agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(1)
      toks = toks.crossJoin(broadcast(best.select(col("a").as("ba"), col("b").as("bb"))))
        .select(col("f"), expr(
          """aggregate(toks, CAST(array() AS array<string>), (acc, t) ->
            |  CASE WHEN try_element_at(acc, -1) = ba AND t = bb
            |       THEN concat(slice(acc, 1, size(acc) - 1), array(concat(ba, bb)))
            |       ELSE concat(acc, array(t)) END)""".stripMargin).as("toks"))
        .localCheckpoint(true)
    }
    toks.agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d (${500 * k}%6d docs base x sf-mult): $s%6.2f s")
}

println("== suggester shape (vocab + freq agg, deletion-1 key explode, key equi-join, levenshtein verify) ==")
for (k <- Seq(1, 8, 16)) {
  val inputs = Seq("ordr", "scann", "colum", "vektor", "key", "zebra")
  val s = timed {
    def delKeys(c: String) =
      s"""array_distinct(concat(array($c), transform(sequence(1, length($c)),
         |  i -> concat(substr($c, 1, i - 1), substr($c, i + 1)))))""".stripMargin
    val vocab = multi("documents", k)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .select(col("term"), col("freq"), explode(expr(delKeys("term"))).as("key"))
    val ik = inputs.toDF("input_term")
      .select(col("input_term"), explode(expr(delKeys("input_term"))).as("key"))
    vocab.join(broadcast(ik), Seq("key"))
      .select(col("input_term"), col("term"), col("freq")).distinct()
      .where(levenshtein(col("input_term"), col("term")) <= 1)
      .collect()
  }
  println(f"  k=$k%2d (${500 * k}%6d docs): $s%6.2f s")
}

println("== percolate shape (distinct doc-term postings, broadcast query-term cut, conjunction count) ==")
for (k <- Seq(1, 8, 16)) {
  val q = graft.operators.TextOps.bm25Queries.flatMap { case (id, ts) =>
    ts.distinct.map(t => (id, t, ts.distinct.length.toLong))
  }.toDF("query_id", "term", "n_terms")
  val s = timed {
    multi("documents", k)
      .select(monotonically_increasing_id().as("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .join(broadcast(q), Seq("term"))
      .groupBy(col("doc_id"), col("query_id"), col("n_terms"))
      .agg(countDistinct(col("term")).as("n_matched"))
      .where(col("n_matched") === col("n_terms"))
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d (${500 * k}%6d docs): $s%6.2f s")
}

println("== span_near shape (positional explode, a-positions fan to <= slop+1 targets, exact-key join) ==")
for (k <- Seq(1, 8, 16)) {
  val q = graft.operators.TextOps.NearQueries
    .map { case (id, a, b, s0) => (id, a, b, s0.toLong) }
    .toDF("query_id", "term_a", "term_b", "slop")
  val s = timed {
    val pi = multi("documents", k)
      .select(monotonically_increasing_id().as("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos0", "term")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("term"))
    val aSide = pi.join(broadcast(q), col("term") === col("term_a"))
      .select(col("query_id"), col("doc_id"), col("pos").as("p1"), col("term_b"),
        explode(expr("sequence(pos + 1, pos + 1 + slop)")).as("p2"))
    aSide.join(pi.select(col("doc_id"), col("pos").as("p2"), col("term").as("term_b")),
        Seq("doc_id", "p2", "term_b"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)), min(col("p1")))
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d (${500 * k}%6d docs): $s%6.2f s")
}

println("== link-prediction shape (edge-derivation scan x k over the fixed nation graph; wedge join + anti join) ==")
for (k <- Seq(1, 8, 16)) {
  val s = timed {
    val li = multi("lineitem", k).select(col("l_orderkey"), col("l_suppkey"))
    val e = li
      .join(spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(spark.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
      .where(col("src") =!= col("dst"))
    val und = e.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"), col("w"))
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
    val t = und.agg(expr("percentile_approx(w, 0.75)").as("t"))
    val strong = und.crossJoin(broadcast(t)).where(col("w") >= col("t"))
      .select(col("a"), col("b"))
    val adj = strong.select(col("a").as("z"), col("b").as("n"))
      .unionAll(strong.select(col("b").as("z"), col("a").as("n")))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    val adjD = adj.join(deg, Seq("z"))
      .select(col("z"), col("n"), expr("1099511627776L div deg").as("ra_c"))
    val wedges = adjD.alias("x").join(adjD.alias("y"),
        col("x.z") === col("y.z") && col("x.n") < col("y.n"))
      .select(col("x.n").as("u"), col("y.n").as("v"), col("x.ra_c").as("ra_c"))
    wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"), sum(col("ra_c")).as("ra"))
      .join(strong.select(col("a").as("u"), col("b").as("v")), Seq("u", "v"), "left_anti")
      .orderBy(col("ra").desc, col("u").asc, col("v").asc).limit(20)
      .collect()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}
println("== frequent-pairs growth vs basket count (synthetic 4-item baskets over a 25-item catalog; pairs/basket <= C(4,2)) ==")
for (n <- Seq(100000, 400000, 1600000)) {
  val items = spark.range(n.toLong).select(col("id").as("basket"),
      explode(expr("transform(sequence(0, 3), j -> abs(hash(id, j)) % 25)")).as("item"))
    .distinct()
  val s = timed {
    val pairs = items.as("a").join(items.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("sup"))
    pairs.agg(count(lit(1)), sum(col("sup"))).head()
  }
  println(f"  N=$n%8d baskets: $s%6.2f s")
}

println("== HITS shape (edge-derivation scan x k over the FIXED 25-node graph; 5 max-normalized integer rounds) ==")
for (k <- Seq(1, 8, 16)) {
  val e0 = multi("lineitem", k).select(col("l_orderkey"), col("l_suppkey"))
    .join(multi("orders", 1).select(col("o_orderkey"), col("o_custkey")),
      col("l_orderkey") === col("o_orderkey"))
    .join(broadcast(multi("customer", 1).select(col("c_custkey"), col("c_nationkey"))),
      col("o_custkey") === col("c_custkey"))
    .join(broadcast(multi("supplier", 1).select(col("s_suppkey"), col("s_nationkey"))),
      col("l_suppkey") === col("s_suppkey"))
    .groupBy(col("c_nationkey").cast("long").as("src"),
      col("s_nationkey").cast("long").as("dst"))
    .agg(count(lit(1)).as("w")).select("src", "dst")
  val s = timed {
    val edges = e0.localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    var hub = nodes.withColumn("h", lit(1000000L))
    var auth = nodes.withColumn("a", lit(1000000L))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    def norm(raw: org.apache.spark.sql.DataFrame, c: String) =
      raw.select(col("node"), col(c), max(col(c)).over(all).as("mx"))
        .select(col("node"), expr(s"($c * 1000000) div mx").as(c))
    for (_ <- 1 to 5) {
      val araw = nodes.join(
          edges.join(broadcast(hub), col("src") === col("node"))
            .groupBy(col("dst")).agg(sum(col("h")).as("a")),
          col("node") === col("dst"), "left")
        .select(col("node"), coalesce(col("a"), lit(0L)).as("a"))
      auth = norm(araw, "a")
      val hraw = nodes.join(
          edges.join(broadcast(auth), col("dst") === col("node"))
            .groupBy(col("src")).agg(sum(col("a")).as("h"))
            .select(col("src"), col("h")),
          col("node") === col("src"), "left")
        .select(col("node"), coalesce(col("h"), lit(0L)).as("h"))
      hub = norm(hraw, "h").localCheckpoint()
    }
    hub.agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== geohash grid shape (md5 + integer interleave per row -> 1024-cell partial agg; cost IS the scan) ==")
for (k <- Seq(1, 8, 16)) {
  val ev = graft.sources.Tables.eventsFrom(multi("events", k))
  val s = timed {
    val c = ev
      .withColumn("__h", expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("lon_micro", expr("__h % 360000000"))
      .withColumn("lat_micro", expr("(__h div 360000000) % 180000000"))
      .withColumn("cell", expr(graft.operators.GeoOps.geohashSql(2)))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("vs"))
    c.agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== collocation shape (bigram partial-count agg; margins are groupBys OFF the vocab^2-bounded pair table) ==")
for (k <- Seq(1, 8, 16)) {
  val docs = multi("documents", k)
  val s = timed {
    val bigrams = docs
      .select(col("doc_id"), explode(array(split(col("text"), " "))).as("words"))
      .where(size(col("words")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(words) - 2), i -> struct(words[i] AS w1, words[i + 1] AS w2))")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bg = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val m1 = bg.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val m2 = bg.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val n = bg.agg(sum(col("c12")).as("nb"))
    bg.where(col("c12") >= 5).join(m1, Seq("w1")).join(m2, Seq("w2"))
      .crossJoin(broadcast(n))
      .select(((col("c12") * col("nb")).cast("double") /
        (col("c1") * col("c2")).cast("double")).as("r"))
      .orderBy(col("r").desc).limit(50).collect()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== ppl-bucket shape (surprisal's bigram shuffle + one lang-keyed ntile window over per-doc scores) ==")
// k-fold duplicates doc_ids, so tercile SEMANTICS are k-degenerate here
// (duplicate scores tie); only the wall-clock shape is under test
for (k <- Seq(1, 8, 16)) {
  val docs = multi("documents", k)
  val s = timed {
    val bigrams = docs
      .select(col("doc_id"), col("lang"), explode(array(split(col("text"), " "))).as("words"))
      .where(size(col("words")) >= 2)
      .select(col("doc_id"), col("lang"), posexplode(expr(
        "transform(sequence(0, size(words) - 2), i -> struct(words[i] AS w1, words[i + 1] AS w2))"))
        .as(Seq("p", "bg")))
      .select(col("doc_id"), col("lang"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bgc = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_bg"))
    val ctx = bgc.groupBy(col("w1")).agg(sum(col("c_bg")).as("c_ctx"))
    val scored = bigrams.join(bgc, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .select(col("doc_id"), col("lang"),
        (length(bin(col("c_ctx"))) - length(bin(col("c_bg")))).cast("long").as("bits"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("nb"), sum(col("bits")).as("tb"))
      .withColumn("mb", col("tb").cast("double") / col("nb").cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("mb").asc, col("doc_id").asc)
    scored.withColumn("t", ntile(3).over(w)).agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== winnowing shape (char k-gram explode -> 2 doc-keyed windows -> per-doc digest agg) ==")
for (k <- Seq(1, 4, 8)) {
  val docs = multi("documents", k)
  val s = timed {
    val grams = docs.where(length(col("text")) >= 8)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, length(text) - 7), i -> substring(text, i, 8))"))
        .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"),
        expr("CAST(conv(substring(md5(gram), 1, 15), 16, 10) AS BIGINT)").as("h"))
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos").asc)
    grams
      .withColumn("m", min(col("h")).over(byPos.rowsBetween(-3, 0)))
      .withColumn("sel", max(col("m")).over(byPos.rowsBetween(0, 3)) === col("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)), sum(when(col("sel"), 1L).otherwise(0L)))
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== langid_cng shape (trigram explode -> (doc,gram) partial agg -> WindowGroupLimit top-40 -> broadcast profile join) ==")
// k-fold duplicates doc_ids: per-doc windows see k copies of each
// gram count — semantics k-degenerate, the wall-clock shape is under test
for (k <- Seq(1, 4, 8)) {
  val docs = multi("documents", k)
  val s = timed {
    val grams = docs.select(col("doc_id"), col("lang"), explode(expr(
      """CASE WHEN length(text) >= 3
        |     THEN transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))
        |     ELSE CAST(array() AS array<string>) END""".stripMargin)).as("g"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("cnt").desc, col("g").asc)
    val docTop = grams.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dr", row_number().over(byDoc).cast("long"))
      .where(col("dr") <= 40)
    val byLang = org.apache.spark.sql.expressions.Window
      .partitionBy(col("plang")).orderBy(col("cnt").desc, col("g").asc)
    val langTop = grams.groupBy(col("lang").as("plang"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("lr", row_number().over(byLang).cast("long"))
      .where(col("lr") <= 40)
      .select(col("plang"), col("g"), col("lr"))
    docTop.crossJoin(broadcast(langTop.select(col("plang")).distinct()))
      .join(broadcast(langTop), Seq("plang", "g"), "left")
      .groupBy(col("doc_id"), col("plang"))
      .agg(sum(coalesce(abs(col("dr") - col("lr")), lit(40L))).as("dist"))
      .agg(count(lit(1))).head()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== corpus_export chain (quality semi -> exact-canonical semi -> LSH-loser anti -> decontaminate anti -> mixture broadcast -> shard manifest) ==")
// k-fold duplicates doc_ids: the chain is k-degenerate semantically
// (copies canonicalize together; pairs between equal ids drop at
// a < b) — the property under test is that every stage stays a
// semi/anti hash join / banded equi-join at k x input
for (k <- Seq(1, 4, 8)) {
  val docs = multi("documents", k)
  val s = timed { graft.operators.TextOps.corpusExportFrom(docs).collect() }
  println(f"  k=$k%2d (${5 * k}%3dk docs): $s%6.2f s")
}

println("== unigram-LM training (corpus word-freq scan x k; 3 EM rounds over the FIXED dictionary x ~700-row composition literal) ==")
for (k <- Seq(1, 8, 16)) {
  val docs = multi("documents", k)
  val s = timed { graft.operators.TextOps.unigramTrainFrom(docs).collect() }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== RAG retrieve (chunk -> dedup -> query-term-cut BM25; |Q| x1/x2/x4, corpus fixed) ==")
for (m <- Seq(1, 2, 4)) {
  val wl = (0 until m).flatMap(i =>
    graft.operators.TextOps.bm25Queries.map { case (q, ts) => (q + 1000L * i, ts) })
  val s = timed { graft.operators.TextOps.ragRetrieve(spark, dir, wl).collect() }
  println(f"  |Q|x$m: ${wl.size}%3d queries: $s%6.2f s")
}

println("== IVF recall curve (sweep width x2/x4: 2/4/8 nprobe points; cost must be ~linear in points) ==")
for (pts <- Seq(Seq(1, 8), Seq(1, 2, 4, 8), Seq(1, 2, 3, 4, 5, 6, 7, 8))) {
  val s = timed {
    pts.map(np => graft.operators.VectorOps.ivfRecall(spark, dir, nprobe = np)
        .select(lit(np.toLong).as("nprobe"), col("query_id"), col("recall_at_k")))
      .reduce(_.unionAll(_)).collect()
  }
  println(f"  ${pts.size}%2d points: $s%6.2f s")
}

println("== more_like_this (seed tf-idf selection -> BM25; |seeds| x1/x2/x4, corpus fixed) ==")
for (m <- Seq(1, 2, 4)) {
  val seeds = (0 until m).flatMap(i =>
    graft.operators.TextOps.MltSeeds.map(_ + 7L * i)).distinct
  val s = timed {
    graft.operators.TextOps.moreLikeThisFor(spark, dir, seeds).collect()
  }
  println(f"  |seeds|x$m: ${seeds.size}%3d seeds: $s%6.2f s")
}

println("== frequent-triples growth vs basket count (support-ordered chained enumeration; triples/basket <= C(4,3)) ==")
for (n <- Seq(100000, 400000, 1600000)) {
  val items = spark.range(n.toLong).select(col("id").as("basket"),
      explode(expr("transform(sequence(0, 3), j -> abs(hash(id, j)) % 25)")).as("item"))
    .distinct()
  val s = timed {
    val sup = items.groupBy(col("item")).agg(count(lit(1)).as("s"))
    val oi = items.join(broadcast(sup), Seq("item"))
    def side(nm: String) = oi.select(col("basket"),
      col("item").as(s"i_$nm"), col("s").as(s"s_$nm"))
    def before(x: String, y: String) =
      (col(s"s_$x") < col(s"s_$y")) ||
        (col(s"s_$x") === col(s"s_$y") && col(s"i_$x") < col(s"i_$y"))
    val t = side("a").join(side("b"), Seq("basket")).where(before("a", "b"))
      .join(side("c"), Seq("basket")).where(before("b", "c"))
      .groupBy(col("i_a"), col("i_b"), col("i_c"))
      .agg(count(lit(1)).as("sup"))
    t.agg(count(lit(1)), sum(col("sup"))).head()
  }
  println(f"  N=$n%8d baskets: $s%6.2f s")
}

println("== graph-ANN beam descent: rounds dial 2/3/4 over the memoized kNN graph (fresh memo per depth) ==")
graft.operators.VectorOps.knnGraph(spark, dir).count() // graph build out of the timing
for (r <- Seq(2, 3, 4)) {
  val s = timed {
    graft.operators.VectorOps.knnGraphBeam(spark, dir, rounds = r).collect()
  }
  println(f"  rounds=$r: $s%6.2f s")
}

println("== DSL aggs (date_histogram x terms + metrics): events x1/x8/x16 through the compiler ==")
for (k <- Seq(1, 8, 16)) {
  val sig = graft.sources.Tables.signalsFrom(graft.sources.Tables.eventsFrom(multi("events", k)))
  val bound = graft.sources.Tables.maxBound(sig, "ts").asInstanceOf[java.sql.Timestamp]
  val env = graft.plans.QueryDsl.Env(
    indices = Map(graft.operators.DslQueries.ApmPattern -> sig),
    mapping = graft.operators.DslQueries.SignalMapping, now = bound)
  val s = timed {
    graft.plans.QueryDsl.search(env, graft.operators.DslQueries.AggsBody).collect()
  }
  println(f"  k=$k%2d: $s%6.2f s")
}

println("== geotile grid: integer tile keys -> partial agg -> TakeOrdered (events x1/x8/x16) ==")
val h60geo = "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"
for (k <- Seq(1, 8, 16)) {
  val ev = graft.sources.Tables.eventsFrom(multi("events", k))
  val coords = ev.withColumn("__h", expr(h60geo))
    .withColumn("lon_micro", expr("__h % 360000000"))
    .withColumn("lat_micro", expr("(__h div 360000000) % 180000000"))
  val s = timed {
    coords
      .withColumn("tile_x", expr(s"CAST(${graft.operators.GeoOps.geotileXSql(graft.operators.GeoOps.GeotileZoom)} AS BIGINT)"))
      .withColumn("tile_y", expr(s"CAST(${graft.operators.GeoOps.geotileYSql(graft.operators.GeoOps.GeotileZoom)} AS BIGINT)"))
      .groupBy(col("tile_x"), col("tile_y"))
      .agg(count(lit(1)).as("doc_count"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .orderBy(col("doc_count").desc).limit(20).collect()
  }
  println(f"  k=$k%2d (${150 * k}%5dk rows): $s%6.2f s")
}

println("== scored bool through the compiler (docs x1/x8/x16, fresh ids): must BM25 + 2 shoulds + gates ==")
// corpus multiplication with ALIGNED fresh ids (id*k + copy), so the
// per-doc relations the scorer derives (tf, dl) stay one-row-per-doc
def bigDocs(k: Int) = {
  val d = multi("documents", 1)
  d.withColumn("c", explode(expr(s"sequence(0, ${k - 1})")))
    .withColumn("doc_id", col("doc_id") * k + col("c")).drop("c")
}
for (k <- Seq(1, 8, 16)) {
  val env = graft.plans.QueryDsl.Env(
    indices = Map("docs-*" -> bigDocs(k)),
    mapping = graft.operators.DslQueries.DocMapping)
  val s = timed {
    graft.plans.QueryDsl.search(env,
      graft.operators.DslQueries.BoolScoredBody).collect()
  }
  println(f"  k=$k%2d (${500 * k}%5d docs): $s%6.2f s")
}

println("== hybrid rank.rrf through the compiler (corpus x1/x8/x16): exact-kNN + BM25 + grid fuse ==")
for (k <- Seq(1, 8, 16)) {
  val docs = multi("documents", 1)
  val embs = multi("embeddings", 1).withColumnRenamed("vec_id", "doc_id")
  val base = docs.join(embs, Seq("doc_id"))
    .withColumn("c", explode(expr(s"sequence(0, ${k - 1})")))
    .withColumn("doc_id", col("doc_id") * k + col("c")).drop("c")
  val env = graft.plans.QueryDsl.Env(
    indices = Map("hybrid-*" -> base),
    mapping = graft.plans.QueryDsl.Mapping(
      fields = Map("text" -> "text", "lang" -> "lang",
        "source" -> "source", "embedding" -> "embedding"),
      idColumn = "doc_id", tsFields = Set.empty))
  val s = timed {
    graft.plans.QueryDsl.search(env,
      graft.operators.DslQueries.HybridBody).collect()
  }
  println(f"  k=$k%2d (${500 * k}%5d rows): $s%6.2f s")
}

sys.exit(0)
