package graft

import graft.operators.GeoOps

/** DuckDB oracle SQL for [[graft.operators.GeoOps]].
  *
  * The synthetic microdegree coordinates replay the identical md5
  * derivation (hex fold — DuckDB has no base-16 `conv`, the
  * OracleText.rotLong device), and the geohash expression is GENERATED
  * BY THE SAME FUNCTION as the Spark side (GeoOps.geohashSql) with `//`
  * substituted for `div` — the two engines run one arithmetic by
  * construction. All aggregation is exact-integer / DECIMAL with the
  * same single edge divisions.
  */
object OracleGeo {

  private val h60 =
    """list_reduce(list_transform(range(1, 16),
      |      i -> CAST(strpos('0123456789abcdef',
      |             substring(md5(CAST(event_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT)),
      |      (a, d) -> a * 16 + d)""".stripMargin

  private val coords =
    s"""coords AS (
       |  SELECT event_type, value,
       |    h % 360000000 AS lon_micro,
       |    (h // 360000000) % 180000000 AS lat_micro
       |  FROM (SELECT event_type, value, $h60 AS h FROM events)
       |)""".stripMargin

  private def geohash(p: Int): String =
    GeoOps.geohashSql(p, (a, b) => s"($a // $b)")

  /** Mirror of GeoOps.geoGrid. */
  val geoGrid: String =
    s"""WITH $coords
       |SELECT ${geohash(GeoOps.GeohashPrecision)} AS cell,
       |  CAST(count(*) AS BIGINT) AS doc_count,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       |  CAST(sum(lon_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    / 1000000.0 - 180.0 AS centroid_lon,
       |  CAST(sum(lat_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    / 1000000.0 - 90.0 AS centroid_lat
       |FROM coords
       |GROUP BY 1
       |ORDER BY doc_count DESC, cell ASC
       |LIMIT ${GeoOps.GridTopK}""".stripMargin

  /** Mirror of GeoOps.geoTileGrid: the tile x/y expressions come from
    * the SAME generators (integer scale-divide + the driver-computed
    * mercator cutoff CASE), so the assignment arithmetic is shared by
    * construction like the geohash.
    */
  val geoTileGrid: String = {
    val z = GeoOps.GeotileZoom
    val x = GeoOps.geotileXSql(z, (a, b) => s"($a // $b)")
    val y = GeoOps.geotileYSql(z)
    s"""WITH $coords,
       |tiles AS (
       |  SELECT CAST($x AS BIGINT) AS tile_x, CAST($y AS BIGINT) AS tile_y,
       |    value, lon_micro, lat_micro
       |  FROM coords
       |),
       |g AS (
       |  SELECT tile_x, tile_y,
       |    CAST(count(*) AS BIGINT) AS doc_count,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       |    CAST(sum(lon_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |      / 1000000.0 - 180.0 AS centroid_lon,
       |    CAST(sum(lat_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |      / 1000000.0 - 90.0 AS centroid_lat
       |  FROM tiles GROUP BY 1, 2
       |)
       |SELECT concat('$z/', CAST(tile_x AS VARCHAR), '/',
       |         CAST(tile_y AS VARCHAR)) AS cell,
       |  tile_x, tile_y, doc_count, value_sum, centroid_lon, centroid_lat
       |FROM g
       |ORDER BY doc_count DESC, cell ASC
       |LIMIT ${GeoOps.GridTopK}""".stripMargin
  }

  /** Mirror of GeoOps.geoRings. */
  val geoRings: String = {
    val edges = GeoOps.RingEdgesMicro.map(e => e * e)
    val ringCase = (("CASE" +: edges.zipWithIndex.map { case (e2, i) =>
      s" WHEN d2 < $e2 THEN $i"
    }) :+ s" ELSE ${edges.size} END").mkString
    s"""WITH $coords,
       |d AS (
       |  SELECT value,
       |    (lon_micro - 180000000) * (lon_micro - 180000000) +
       |    (lat_micro - 90000000) * (lat_micro - 90000000) AS d2
       |  FROM coords
       |),
       |per AS (
       |  SELECT $ringCase AS ring,
       |    CAST(count(*) AS BIGINT) AS doc_count,
       |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
       |  FROM d GROUP BY 1
       |)
       |SELECT f.ring,
       |  COALESCE(per.doc_count, 0) AS doc_count,
       |  COALESCE(per.value_sum, 0.0) AS value_sum
       |FROM range(0, ${edges.size + 1}) f(ring)
       |LEFT JOIN per ON per.ring = f.ring""".stripMargin
  }

  /** Mirror of GeoOps.geoBbox. */
  val geoBbox: String =
    s"""WITH $coords
       |SELECT event_type,
       |  CAST(count(*) AS BIGINT) AS doc_count,
       |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       |  CAST(min(lon_micro) AS DOUBLE) / 1000000.0 - 180.0 AS min_lon,
       |  CAST(max(lon_micro) AS DOUBLE) / 1000000.0 - 180.0 AS max_lon
       |FROM coords
       |WHERE lon_micro >= ${GeoOps.BboxLonLo} AND lon_micro < ${GeoOps.BboxLonHi}
       |  AND lat_micro >= ${GeoOps.BboxLatLo} AND lat_micro < ${GeoOps.BboxLatHi}
       |GROUP BY event_type""".stripMargin

  /** Mirror of GeoOps.geoCentroid. */
  val geoCentroid: String =
    s"""WITH $coords
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(lon_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    / 1000000.0 - 180.0 AS centroid_lon,
       |  CAST(sum(lat_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    / 1000000.0 - 90.0 AS centroid_lat,
       |  CAST(min(lon_micro) AS DOUBLE) / 1000000.0 - 180.0 AS min_lon,
       |  CAST(max(lon_micro) AS DOUBLE) / 1000000.0 - 180.0 AS max_lon,
       |  CAST(min(lat_micro) AS DOUBLE) / 1000000.0 - 90.0 AS min_lat,
       |  CAST(max(lat_micro) AS DOUBLE) / 1000000.0 - 90.0 AS max_lat
       |FROM coords
       |GROUP BY event_type""".stripMargin
}
