package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** ES geo-aggregation parity — `geohash_grid`, `geo_distance`, and
  * `geo_centroid`/`geo_bounds` — over the events stream.
  *
  * The testdata carries no coordinate columns, so each event gets a
  * DETERMINISTIC synthetic location derived from its id's md5 (the
  * corpus-wide hashing device, TextOps.rotLong): the 60-bit digest
  * prefix splits into longitude ∈ [0, 360·10⁶) and latitude
  * ∈ [0, 180·10⁶) integer MICRODEGREE fields. Every aggregation below
  * then works in exact integer space — geohash cells are bit
  * interleavings of scaled integers, ring membership compares integer
  * squared distances, centroids are exact integer sums — with the
  * microdegree→degree division (and nothing else) in double at the
  * edge, so every output is bit-identical to the DuckDB mirror.
  *
  * Shape at 100 TB: all three are single partial-aggregated groupBys
  * on scan-computed integer keys (no join, no window); the grid's
  * top-k is a TakeOrderedAndProject. The coordinate derivation is one
  * md5 per row inside whole-stage codegen.
  */
object GeoOps {

  /** Geohash cell precision (characters, 5 bits each) for [[geoGrid]].
    * 2 chars = 1024 global cells ≈ the zoom a dashboard heat-map opens
    * at; the bit arithmetic below is generic in this constant.
    */
  val GeohashPrecision = 2

  /** Bucket budget for [[geoGrid]] (ES `geohash_grid` `size`). */
  val GridTopK = 20

  /** Ring edges for [[geoRings]], in MICROdegrees from the domain
    * center — compared SQUARED, so membership is pure integer math
    * (the flat-space analog of ES `geo_distance`'s metre rings; the
    * synthetic coordinates carry no real curvature to honor, and
    * haversine's transcendentals are exactly what cross-engine
    * bit-exactness cannot use).
    */
  val RingEdgesMicro: Seq[Long] = Seq(30000000L, 60000000L, 90000000L)

  /** 60-bit hash of the event id (md5-prefix device). */
  private def h60(idCol: String): String =
    s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 15), 16, 10) AS BIGINT)"

  /** Integer microdegree coordinates attached to ANY frame carrying
    * `event_id`, via ONE md5 per row (the hash is projected once; both
    * fields derive from it behind an explode-barrier-free select —
    * integer div/mod only). THE single definition of the coordinate
    * derivation: the batch operators ([[withCoords]]) and the
    * streaming grid store (StreamingGeo.gridBatch) both call this, so
    * the store's drain≡batch bit-exactness cannot drift if the
    * derivation constants ever change.
    */
  private[graft] def attachCoords(df: DataFrame): DataFrame =
    df.withColumn("__h", expr(h60("event_id")))
      .withColumn("lon_micro", expr("__h % 360000000"))
      .withColumn("lat_micro", expr("(__h div 360000000) % 180000000"))
      .drop("__h")

  /** The events table with coordinates attached. */
  private[graft] def withCoords(spark: SparkSession, dir: String): DataFrame =
    attachCoords(Tables.events(spark, dir))

  /** The geohash base-32 alphabet (public spec: no a/i/l/o). */
  val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Geohash of (lon_micro, lat_micro) at precision `p` as a single
    * integer-arithmetic SQL expression: scale each axis to its bit
    * budget (longitude owns the even bit positions — one extra bit at
    * odd precisions, per the spec), interleave with div/mod, then emit
    * base-32 characters. Equivalent to the classic bisection loop
    * because each scaled integer IS the sequence of bisection
    * decisions. `idiv` abstracts the one syntax the engines disagree
    * on (Spark `a div b`, DuckDB `a // b`) so the DuckDB mirror
    * (OracleGeo) generates the IDENTICAL arithmetic from this one
    * function — zero drift between engine and oracle by construction.
    */
  def geohashSql(p: Int,
      idiv: (String, String) => String = (a, b) => s"($a div $b)"): String = {
    val bits = 5 * p
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    // xi = lon_micro scaled to [0, 2^lonBits); exact: the product is
    // ≤ 360e6 · 2^lonBits ≪ 2^63
    val xi = idiv(s"(lon_micro * ${1L << lonBits})", "360000000")
    val yi = idiv(s"(lat_micro * ${1L << latBits})", "180000000")
    // interleave: sequence index i (0 = MSB) takes lon bit for even i
    val terms = (0 until bits).map { i =>
      val (src, srcBits, k) =
        if (i % 2 == 0) (xi, lonBits, i / 2) else (yi, latBits, i / 2)
      val srcBit = srcBits - 1 - k
      val outBit = bits - 1 - i
      s"((${idiv(src, (1L << srcBit).toString)} % 2) * ${1L << outBit})"
    }
    val v = terms.mkString("(", " + ", ")")
    val chars = (0 until p).map { g =>
      val shift = 5 * (p - 1 - g)
      s"substring('$GeohashAlphabet', CAST((${idiv(v, (1L << shift).toString)} % 32) + 1 AS INT), 1)"
    }
    chars.mkString("concat(", ", ", ")")
  }

  /** ES `geohash_grid` aggregation: doc counts and value mass per
    * geohash cell, plus the exact cell centroid (integer coordinate
    * sums, two edge divisions per axis), top-[[GridTopK]] by count
    * with the cell id as tiebreak.
    */
  def geoGrid(spark: SparkSession, dir: String): DataFrame =
    withCoords(spark, dir)
      .withColumn("cell", expr(geohashSql(GeohashPrecision)))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("doc_count"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"),
        (sum(col("lon_micro")).cast("double") / count(lit(1)).cast("double") /
          1000000.0d - 180.0d).as("centroid_lon"),
        (sum(col("lat_micro")).cast("double") / count(lit(1)).cast("double") /
          1000000.0d - 90.0d).as("centroid_lat"))
      .orderBy(col("doc_count").desc, col("cell").asc)
      .limit(GridTopK)

  /** Web-mercator zoom for [[geoTileGrid]] (ES `geotile_grid`
    * `precision`): 2^z × 2^z tiles.
    */
  val GeotileZoom = 3

  /** Mercator tile-row latitude cutoffs at zoom `z`, as integer
    * microdegrees: boundary y (1..2^z−1) separates tile rows y−1 and y,
    * lat(y) = atan(sinh(π(1 − 2y/2^z))). The transcendentals run ONCE
    * on the DRIVER (plan-time, like the unigram composition literal)
    * and both engines receive the identical integer literals — the
    * in-plan tile assignment is pure integer compares, so the
    * cross-engine no-transcendentals rule holds even though the
    * projection itself is genuinely mercator. Descending in latitude
    * as y grows (y = 0 is the north row, the tile convention).
    */
  private[graft] def mercatorCutsMicro(z: Int): Seq[Long] =
    (1 until (1 << z)).map { y =>
      val latDeg = math.toDegrees(
        math.atan(math.sinh(math.Pi * (1.0 - 2.0 * y / (1 << z)))))
      math.floor((latDeg + 90.0) * 1e6).toLong
    }

  /** Tile x: longitude scaled to [0, 2^z) — exact integer product/
    * divide (the geohash `xi` device). One generator, both engines.
    */
  def geotileXSql(z: Int,
      idiv: (String, String) => String = (a, b) => s"($a div $b)"): String =
    idiv(s"(lon_micro * ${1L << z})", "360000000")

  /** Tile y: the literal-cutoff CASE (points north of the first
    * boundary land in row 0; beyond the last, the bottom row — ES
    * clamps out-of-mercator-range latitudes to the edge rows the same
    * way). Plain integer literals: the generated text must parse on
    * BOTH engines (no Scala `L` suffix — invalid in DuckDB SQL).
    */
  def geotileYSql(z: Int): String = {
    val cuts = mercatorCutsMicro(z)
    (("CASE" +: cuts.zipWithIndex.map { case (b, i) =>
      s" WHEN lat_micro > $b THEN $i"
    }) :+ s" ELSE ${(1 << z) - 1} END").mkString
  }

  /** ES `geotile_grid` aggregation — the geohash grid's web-mercator
    * twin: doc counts, value mass, and exact integer centroids per
    * `z/x/y` tile, top-[[GridTopK]] by count. Same partial-agg shape
    * (scan-computed integer keys, no join, TakeOrderedAndProject cut).
    */
  def geoTileGrid(spark: SparkSession, dir: String): DataFrame =
    withCoords(spark, dir)
      .withColumn("tile_x",
        expr(s"CAST(${geotileXSql(GeotileZoom)} AS BIGINT)"))
      .withColumn("tile_y", expr(s"CAST(${geotileYSql(GeotileZoom)} AS BIGINT)"))
      .groupBy(col("tile_x"), col("tile_y"))
      .agg(count(lit(1)).as("doc_count"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"),
        (sum(col("lon_micro")).cast("double") / count(lit(1)).cast("double") /
          1000000.0d - 180.0d).as("centroid_lon"),
        (sum(col("lat_micro")).cast("double") / count(lit(1)).cast("double") /
          1000000.0d - 90.0d).as("centroid_lat"))
      .select(
        concat(lit(s"$GeotileZoom/"), col("tile_x").cast("string"),
          lit("/"), col("tile_y").cast("string")).as("cell"),
        col("tile_x"), col("tile_y"), col("doc_count"), col("value_sum"),
        col("centroid_lon"), col("centroid_lat"))
      .orderBy(col("doc_count").desc, col("cell").asc)
      .limit(GridTopK)

  /** ES `geo_distance` aggregation: concentric rings around the domain
    * center, membership decided on INTEGER squared microdegree
    * distance (exact: each square ≤ (180·10⁶)² < 2⁶³/2). Every ring is
    * emitted (zero-filled via the literal ring frame) so the bucket
    * list is stable.
    */
  def geoRings(spark: SparkSession, dir: String): DataFrame = {
    val edges = RingEdgesMicro.map(e => e * e)
    val ringCase = (("CASE" +: edges.zipWithIndex.map { case (e2, i) =>
      s" WHEN d2 < ${e2}L THEN ${i}L"
    }) :+ s" ELSE ${edges.size}L END").mkString
    val per = withCoords(spark, dir)
      .withColumn("d2",
        expr("(lon_micro - 180000000) * (lon_micro - 180000000) + " +
          "(lat_micro - 90000000) * (lat_micro - 90000000)"))
      .withColumn("ring", expr(ringCase))
      .groupBy(col("ring"))
      .agg(count(lit(1)).as("doc_count"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
    val frame = spark.range(0, RingEdgesMicro.size + 1).toDF("ring")
    frame.join(per, Seq("ring"), "left")
      .select(col("ring"),
        coalesce(col("doc_count"), lit(0L)).as("doc_count"),
        coalesce(col("value_sum"), lit(0.0d)).as("value_sum"))
  }

  /** Bounding box for [[geoBbox]] in integer microdegrees:
    * lon ∈ [−45°, 45°), lat ∈ [0°, 60°).
    */
  val BboxLonLo = 135000000L
  val BboxLonHi = 225000000L
  val BboxLatLo = 90000000L
  val BboxLatHi = 150000000L

  /** ES `geo_bounding_box` filter + per-type aggregations inside the
    * box: membership is four integer compares on the microdegree
    * columns (a real deployment stores these as the indexed integer
    * pair for exactly this reason — the filter folds into the scan),
    * then one partial-aggregated groupBy.
    */
  def geoBbox(spark: SparkSession, dir: String): DataFrame =
    withCoords(spark, dir)
      .where(col("lon_micro") >= BboxLonLo && col("lon_micro") < BboxLonHi &&
        col("lat_micro") >= BboxLatLo && col("lat_micro") < BboxLatHi)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("doc_count"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"),
        (min(col("lon_micro")).cast("double") / 1000000.0d - 180.0d)
          .as("min_lon"),
        (max(col("lon_micro")).cast("double") / 1000000.0d - 180.0d)
          .as("max_lon"))

  /** ES `geo_centroid` + `geo_bounds` per event type: exact integer
    * coordinate sums (one division per centroid axis at the edge) and
    * integer min/max bounds, reported in degrees.
    */
  def geoCentroid(spark: SparkSession, dir: String): DataFrame = {
    def deg(c: Column, off: Double): Column =
      c.cast("double") / 1000000.0d - off
    withCoords(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("lon_micro")).as("slon"), sum(col("lat_micro")).as("slat"),
        min(col("lon_micro")).as("lon0"), max(col("lon_micro")).as("lon1"),
        min(col("lat_micro")).as("lat0"), max(col("lat_micro")).as("lat1"))
      .select(col("event_type"), col("n"),
        (col("slon").cast("double") / col("n").cast("double") / 1000000.0d
          - 180.0d).as("centroid_lon"),
        (col("slat").cast("double") / col("n").cast("double") / 1000000.0d
          - 90.0d).as("centroid_lat"),
        deg(col("lon0"), 180.0d).as("min_lon"), deg(col("lon1"), 180.0d).as("max_lon"),
        deg(col("lat0"), 90.0d).as("min_lat"), deg(col("lat1"), 90.0d).as("max_lat"))
  }
}
