package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial distance self-join — "all point pairs within `radiusKm`" — as a
  * grid-cell-bucketed equi join, never a cross join.
  *
  * The analytics use case over the spot tables: co-located transmitter
  * discovery, receiver-density maps, interference-candidate pairs (the
  * reference stores lat/lon per spot — wsprnet_azi_calc.py:77-90 — but has
  * no pair query; this is the scale-capable primitive it would need).
  *
  * Physical shape — the LSH-style bucket contract of the dedup family
  * (candidates from an equi join on a coarse key, exact verification after):
  *
  *  1. Each point maps to an integer cell `(latCell, lonCell)` of side
  *     `cellDeg = radiusKm / KmPerLatDeg` degrees — chosen so a pair within
  *     `radiusKm` differs by AT MOST ONE latitude cell.
  *  2. Longitude degrees shrink with latitude, so the probe side expands to
  *     `span(lat)` lon-neighbor cells, where span is computed against the
  *     worst-case (pole-most) latitude the PARTNER can have — sound by
  *     construction, bounded because probing is capped at `CapLat`.
  *  3. Above `CapLat - cellDeg` the rings get too short for per-cell
  *     probing, so those points ALSO register in one polar-cap bucket per
  *     hemisphere; deep-polar probes (`|lat| >= CapLat`) go to the cap
  *     ONLY. Any partner of a deep-polar point is within `cellDeg` of
  *     latitude, hence itself cap-registered — no pair crosses the scheme
  *     boundary unseen. The cap holds a radius-1100-km disc of points (a
  *     documented skew key; at WSPR densities a few hundred rows).
  *  4. Candidates equi-join on the cell key (the ONE shuffle), exact
  *     haversine verifies, duplicates from multi-registration drop on the
  *     final `dropDuplicates(a_id, b_id)` — the simhashPairs convention.
  *
  * Longitude cells wrap at the ±180 seam via floorMod, and the seam cell is
  * at most `cellDeg` wide, so ±span probing stays sound there.
  *
  * Determinism for the oracle: the distance is ONE fixed-parenthesization
  * haversine over doubles, rounded to 6 decimals both for the predicate and
  * the emitted `dist_km` — the round-6 trig convention of the azimuth
  * family (libm sin/cos agree across engines far beyond 1e-6 at these
  * magnitudes; fixtures keep a measured margin to the radius boundary). */
object Spatial {

  /** Minimum km per degree of latitude (meridian arc, WGS-84 at the
    * equator): using the MINIMUM keeps `cellDeg` an overestimate of the
    * degrees a radius can span, which is the sound direction. */
  val KmPerLatDeg = 110.574

  /** Mean-Earth radius (km) for the haversine — the same sphere the
    * reference's azimuth math assumes. */
  val EarthRadiusKm = 6371.0

  /** Probing latitude cap: beyond this the per-cell ring walk stops and the
    * polar-cap bucket takes over. */
  val CapLat = 85.0

  /** Fixed-parenthesization haversine distance in km (double). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val p1 = radians(lat1); val p2 = radians(lat2)
    val dp = radians(lat2 - lat1); val dl = radians(lon2 - lon1)
    val a = sin(dp / 2) * sin(dp / 2) +
      cos(p1) * cos(p2) * (sin(dl / 2) * sin(dl / 2))
    lit(2.0 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** All unordered pairs (a_id < b_id) with haversine distance <=
    * `radiusKm`, exact (the bucketing loses no pair — the oracle runs the
    * plain quadratic predicate and the hashes must agree). Input: (id, lat,
    * lon); output: (a_id, b_id, dist_km round-6). */
  def withinDistancePairs(points: DataFrame, radiusKm: Double): DataFrame = {
    require(radiusKm > 0 && radiusKm <= 1000,
      s"withinDistancePairs: radiusKm must be in (0, 1000], got $radiusKm")
    val cellDeg = radiusKm / KmPerLatDeg
    val ringCells = math.max(1L, math.floor(360.0 / cellDeg).toLong)
    // Worst-case partner latitude for a probe at |lat| is one cell closer
    // to the pole, capped at CapLat (beyond that the cap bucket covers
    // it). The exact haversine inverse bounds the partner's longitude
    // offset: sin^2(d/2R) >= cos(p1)cos(p2) sin^2(dLon/2), so
    // dLon <= 2 asin(sin(r/2R) / cos(phiMax)) — no linear approximation,
    // sound at any latitude the walk handles.
    def lonSpan(absLat: Column): Column = {
      val cosMax = cos(radians(least(absLat + lit(cellDeg), lit(CapLat))))
      val dLonDeg = degrees(lit(2.0) *
        asin(least(lit(1.0), lit(math.sin(radiusKm / (2 * EarthRadiusKm))) / cosMax)))
      ceil(dLonDeg / lit(cellDeg)).cast("int")
    }
    val latCell = floor(col("lat") / cellDeg).cast("long")
    // The seam cell (floor index == ringCells when 360/cellDeg is not
    // integral) folds onto cell 0 on BOTH sides — the two are geographic
    // neighbors at ±180, so the merge only widens one bucket.
    val lonCell = pmod(floor((col("lon") + 180.0) / cellDeg).cast("long"),
      lit(ringCells))
    val capKey = -1000000L // latCell values are within ±90/cellDeg << 1e6
    val p = points.select(col("id").cast("long").as("id"),
      col("lat").cast("double").as("lat"), col("lon").cast("double").as("lon"),
      latCell.as("latc"), lonCell.as("lonc"))
    // Build side: own cell, plus the polar cap for near-polar points.
    val hemi = when(col("lat") >= 0, lit(1L)).otherwise(lit(2L))
    val build = p.select(col("id"), col("lat"), col("lon"),
        struct(col("latc"), col("lonc")).as("cell"))
      .unionByName(p.filter(abs(col("lat")) >= CapLat - cellDeg)
        .select(col("id"), col("lat"), col("lon"),
          struct(lit(capKey).as("latc"), hemi.as("lonc")).as("cell")))
    // Probe side: deep-polar points probe the cap only; the rest walk the
    // 3 x (2*span+1) neighborhood (with lon wrap), plus the cap if within
    // one cell of it.
    val span = lonSpan(abs(col("lat")))
    val deep = p.filter(abs(col("lat")) >= CapLat)
      .select(col("id"), col("lat"), col("lon"),
        struct(lit(capKey).as("latc"), hemi.as("lonc")).as("cell"))
    val walk = p.filter(abs(col("lat")) < CapLat)
      .withColumn("dlat", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("dlon", explode(sequence(-span, span)))
      .select(col("id"), col("lat"), col("lon"),
        struct((col("latc") + col("dlat")).as("latc"),
          pmod(col("lonc") + col("dlon"), lit(ringCells)).as("lonc")).as("cell"))
    val nearCap = p.filter(abs(col("lat")) >= CapLat - cellDeg &&
        abs(col("lat")) < CapLat)
      .select(col("id"), col("lat"), col("lon"),
        struct(lit(capKey).as("latc"), hemi.as("lonc")).as("cell"))
    val probe = walk.unionByName(deep).unionByName(nearCap)
    val d = round(haversineKm(col("a_lat"), col("a_lon"),
      col("b_lat"), col("b_lon")), 6)
    probe.select(col("id").as("a_id"), col("lat").as("a_lat"),
        col("lon").as("a_lon"), col("cell"))
      .join(build.select(col("id").as("b_id"), col("lat").as("b_lat"),
        col("lon").as("b_lon"), col("cell")), Seq("cell"))
      .filter(col("a_id") < col("b_id") && d <= radiusKm)
      .select(col("a_id"), col("b_id"), d.as("dist_km"))
      .dropDuplicates("a_id", "b_id")
  }
}
