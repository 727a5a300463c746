package graft

import org.apache.spark.sql.functions._

import graft.operators.GeoOps

/** Geo-aggregation family: the integer geohash expression against the
  * classic bisection algorithm, ring membership, and exact centroid
  * replay — all on the sf0.001 fixture.
  */
class GeoOpsSpec extends SparkSpec {

  /** Reference geohash: the textbook bisection loop over real-degree
    * coordinates — an INDEPENDENT implementation of what
    * GeoOps.geohashSql derives with scaled-integer interleaving.
    */
  private def refGeohash(lon: Double, lat: Double, p: Int): String = {
    var (lonLo, lonHi) = (-180.0, 180.0)
    var (latLo, latHi) = (-90.0, 90.0)
    val sb = new StringBuilder
    var bit = 0
    var ch = 0
    var even = true
    while (sb.length < p) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = ch * 2 + 1; lonLo = mid }
        else { ch = ch * 2; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = ch * 2 + 1; latLo = mid }
        else { ch = ch * 2; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb += GeoOps.GeohashAlphabet(ch); bit = 0; ch = 0 }
    }
    sb.toString
  }

  test("geohash expression matches the classic bisection algorithm") {
    // microdegree grid points ARE exact bisection inputs (degree =
    // micro/1e6 is within double's 2^-20-per-degree resolution), so
    // the two derivations must agree char-for-char
    val micro = GeoOps.withCoords(spark, sfDir)
      .select(col("lon_micro"), col("lat_micro"))
      .withColumn("cell", expr(GeoOps.geohashSql(GeoOps.GeohashPrecision)))
      .withColumn("cell5", expr(GeoOps.geohashSql(5)))
      .collect()
    assert(micro.length > 0)
    micro.foreach { r =>
      val (lm, tm) = (r.getLong(0), r.getLong(1))
      val lon = lm / 1e6 - 180.0
      val lat = tm / 1e6 - 90.0
      assert(r.getString(2) === refGeohash(lon, lat, GeoOps.GeohashPrecision),
        s"precision 2 at ($lon, $lat)")
      assert(r.getString(3) === refGeohash(lon, lat, 5),
        s"precision 5 at ($lon, $lat)")
    }
  }

  test("geo_grid: counts conserve and the top list is fully tiebroken") {
    val cells = GeoOps.withCoords(spark, sfDir)
      .select(expr(GeoOps.geohashSql(GeoOps.GeohashPrecision)).as("cell"))
      .groupBy("cell").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = GeoOps.geoGrid(spark, sfDir).collect()
    assert(got.length === math.min(GeoOps.GridTopK, cells.size))
    val want = cells.toSeq.sortBy { case (c, n) => (-n, c) }
      .take(GeoOps.GridTopK)
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq === want)
    // every cell id is well-formed base-32
    got.foreach(r => assert(
      r.getString(0).forall(GeoOps.GeohashAlphabet.contains(_))))
  }

  test("geo_rings: membership replay, conservation, dense ring frame") {
    val rows = GeoOps.geoRings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet === (0 to GeoOps.RingEdgesMicro.size).map(_.toLong).toSet)
    val pts = GeoOps.withCoords(spark, sfDir)
      .select("lon_micro", "lat_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = pts.map { case (lm, tm) =>
      val d2 = (lm - 180000000L) * (lm - 180000000L) +
        (tm - 90000000L) * (tm - 90000000L)
      GeoOps.RingEdgesMicro.indexWhere(e => d2 < e * e) match {
        case -1 => GeoOps.RingEdgesMicro.size.toLong
        case i  => i.toLong
      }
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.values.sum === pts.length.toLong)
    want.foreach { case (ring, n) => assert(rows(ring) === n, s"ring $ring") }
  }

  test("geo_bbox: box membership and per-type aggregates replay") {
    val pts = GeoOps.withCoords(spark, sfDir)
      .select("event_type", "lon_micro", "lat_micro").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val inBox = pts.filter { case (_, lon, lat) =>
      lon >= GeoOps.BboxLonLo && lon < GeoOps.BboxLonHi &&
        lat >= GeoOps.BboxLatLo && lat < GeoOps.BboxLatHi
    }
    val got = GeoOps.geoBbox(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === inBox.map(_._1).toSet)
    inBox.groupBy(_._1).foreach { case (t, es) =>
      assert(got(t) === es.length.toLong, s"type $t")
    }
    // the box is a REAL filter: strictly fewer rows than the corpus
    assert(inBox.length < pts.length && inBox.nonEmpty)
  }

  test("geo_centroid: exact integer-sum centroid and bounds per type") {
    val pts = GeoOps.withCoords(spark, sfDir)
      .select("event_type", "lon_micro", "lat_micro").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = GeoOps.geoCentroid(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    pts.groupBy(_._1).foreach { case (t, es) =>
      val r = got(t)
      val n = es.length
      assert(r.getLong(1) === n.toLong)
      assert(r.getDouble(2) ===
        es.map(_._2).sum.toDouble / n.toDouble / 1e6 - 180.0, s"$t clon")
      assert(r.getDouble(3) ===
        es.map(_._3).sum.toDouble / n.toDouble / 1e6 - 90.0, s"$t clat")
      assert(r.getDouble(4) === es.map(_._2).min.toDouble / 1e6 - 180.0)
      assert(r.getDouble(5) === es.map(_._2).max.toDouble / 1e6 - 180.0)
      assert(r.getDouble(6) === es.map(_._3).min.toDouble / 1e6 - 90.0)
      assert(r.getDouble(7) === es.map(_._3).max.toDouble / 1e6 - 90.0)
    }
  }

  test("geo_tile_grid: mercator tile assignment replays the real projection") {
    import GeoOps.{GeotileZoom, GridTopK}
    val n = 1 << GeotileZoom
    // tile of a point via the REAL double-precision mercator formula --
    // the driver-computed integer cutoffs must agree with it everywhere
    // except exactly at a cutoff (convention-pinned, asserted below)
    def mercY(latMicro: Long): Long = {
      val lat = math.toRadians(latMicro / 1e6 - 90.0)
      val y = (1.0 - math.log(math.tan(lat) + 1.0 / math.cos(lat)) / math.Pi) / 2.0 * n
      math.max(0L, math.min(n - 1L, math.floor(y).toLong))
    }
    val cuts = GeoOps.mercatorCutsMicro(GeotileZoom)
    val pts = GeoOps.withCoords(spark, sfDir)
      .select("lon_micro", "lat_micro", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def tile(p: (Long, Long, Double)): (Long, Long) = {
      val x = p._1 * n / 360000000L
      val y = cuts.count(p._2 <= _).toLong // rows count from the north
      (x, y)
    }
    // the integer-cutoff assignment agrees with the double formula off
    // the boundary (and sits within one row of it everywhere)
    pts.foreach { p =>
      val viaCuts = tile(p)._2
      val viaMerc = mercY(p._2)
      if (!cuts.contains(p._2))
        assert(viaCuts === viaMerc, s"lat ${p._2}")
    }
    val want = pts.groupBy(tile).map { case ((x, y), es) =>
      (s"$GeotileZoom/$x/$y", (es.length.toLong,
        es.map(e => BigDecimal(e._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble))
    }
    val got = GeoOps.geoTileGrid(spark, sfDir).collect()
    assert(got.length === math.min(GridTopK, want.size))
    val wantTop = want.toSeq.sortBy { case (c, (dc, _)) => (-dc, c) }
      .take(GridTopK)
    assert(got.map(r => (r.getString(0), (r.getLong(3), r.getDouble(4)))).toSeq
      === wantTop)
    got.foreach { r =>
      assert(r.getString(0) === s"$GeotileZoom/${r.getLong(1)}/${r.getLong(2)}")
      assert(r.getLong(1) >= 0 && r.getLong(1) < n)
      assert(r.getLong(2) >= 0 && r.getLong(2) < n)
    }
  }
}
