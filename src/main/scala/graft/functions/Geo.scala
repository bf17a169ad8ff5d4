package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic + band scalar functions, re-expressed as pure Catalyst built-in
  * column expressions (no UDFs — everything stays inside whole-stage codegen).
  *
  * Semantics mirror the reference's per-row Python math
  * (reference: wsprnet_azi_calc.py:77-140), with two conscious divergences,
  * both pinned by tests and mirrored in the DuckDB oracle SQL:
  *
  *  - rounding of azimuths is HALF_UP (Spark/DuckDB `round`) rather than
  *    Python's banker's rounding — observable only at exact .5 ties, which do
  *    not occur for locator-derived azimuths;
  *  - a NaN vertex longitude (acos domain error on pathological inputs,
  *    wsprnet_azi_calc.py:124-126) falls through to the deterministic
  *    "off-track endpoint" fallback instead of propagating NaN, because both
  *    Spark and DuckDB order NaN greater than all doubles, so the off-track
  *    test at wsprnet_azi_calc.py:130 selects the fallback.
  */
object Geo {

  /** Positive modulus matching Python's `%` on doubles: result in [0, m).
    * Written as (x fmod m) + m when negative — identical bit-level arithmetic
    * in Spark (Java `%` = C fmod) and DuckDB (`fmod`). */
  def posMod(x: Column, m: Double): Column = {
    val r = x % lit(m)
    when(r < 0, r + lit(m)).otherwise(r)
  }

  private def ch(loc: Column, i: Int): Column = ascii(substring(loc, i, 1))

  /** Maidenhead locator (4- or 6-char, 6th-pair case-insensitive) -> latitude
    * in degrees. Ref: wsprnet_azi_calc.py:77-90 (note the reference's 64/96
    * ascii_base with the `ord > 88` lowercase test at :84-87, and the
    * center-of-cell +1/2 and -1/48 offsets at :81, :88). */
  def locLat(locator: Column): Column = {
    val l = trim(locator)
    val lat4 = (ch(l, 2) - 65) * 10 + (ch(l, 4) - 48) + lit(0.5) - 90
    val base = when(ch(l, 5) > 88, 96).otherwise(64)
    val lat6 = lat4 - lit(0.5) + (ch(l, 6) - base) / lit(24.0) - lit(1.0 / 48)
    when(length(l) === 6, lat6).otherwise(lat4)
  }

  /** Maidenhead locator -> longitude in degrees. Ref: wsprnet_azi_calc.py:82, :89. */
  def locLon(locator: Column): Column = {
    val l = trim(locator)
    val lon4 = (ch(l, 1) - 65) * 20 + (ch(l, 3) - 48) * 2 + lit(1.0) - 180
    val base = when(ch(l, 5) > 88, 96).otherwise(64)
    val lon6 = lon4 - lit(1.0) + (ch(l, 5) - base) / lit(12.0) - lit(1.0 / 24)
    when(length(l) === 6, lon6).otherwise(lon4)
  }

  /** Great-circle forward azimuth at the receiver, rx -> tx, degrees [0, 360).
    * Ref: wsprnet_azi_calc.py:103-106. All inputs in degrees. */
  def rxAzimuth(txLat: Column, txLon: Column, rxLat: Column, rxLon: Column): Column = {
    val phiTx = radians(txLat); val phiRx = radians(rxLat)
    val dLam = radians(txLon) - radians(rxLon)
    val y = sin(dLam) * cos(phiTx)
    val x = cos(phiRx) * sin(phiTx) - sin(phiRx) * cos(phiTx) * cos(dLam)
    posMod(degrees(atan2(y, x)), 360.0)
  }

  /** Great-circle forward azimuth at the transmitter, tx -> rx, degrees [0, 360).
    * Ref: wsprnet_azi_calc.py:108-111 (same formula, endpoints swapped via
    * negated delta-lambda). */
  def txAzimuth(txLat: Column, txLon: Column, rxLat: Column, rxLon: Column): Column =
    rxAzimuth(rxLat, rxLon, txLat, txLon)

  /** Latitude of the great-circle path vertex (point nearest a pole), before
    * the off-track fallback. Ref: wsprnet_azi_calc.py:116-122.
    * Same-meridian pairs take the max-|lat| endpoint (ties -> tx, matching
    * Python max(key=abs) first-wins, :118); otherwise Clairaut's formula with
    * the >90 fold (:120-122). */
  def vertexLatRaw(txLat: Column, txLon: Column, rxLat: Column, rxLon: Column,
      rxAzi: Column): Column = {
    val maxAbs = maxByAbs(txLat, rxLat)
    val v0 = when(txLon === rxLon, maxAbs)
      .otherwise(degrees(acos(sin(radians(rxAzi)) * cos(radians(rxLat)))))
    when(v0 > 90.0, lit(180.0) - v0).otherwise(v0)
  }

  /** Python max([a, b], key=abs): first maximal element wins ties -> a on |a|==|b|. */
  def maxByAbs(a: Column, b: Column): Column =
    when(abs(a) >= abs(b), a).otherwise(b)

  /** Full vertex (lat, lon) as a 2-field struct `vlat`,`vlon`, including the
    * longitude wrap (:123-128) and the off-track endpoint fallback (:130-136). */
  def vertex(txLat: Column, txLon: Column, rxLat: Column, rxLon: Column,
      rxAzi: Column): Column = {
    val vLat = vertexLatRaw(txLat, txLon, rxLat, rxLon, rxAzi)
    val arc = degrees(acos(tan(radians(rxLat)) / tan(radians(vLat))))
    val vLon0 = when(rxAzi < 180, posMod(rxLon + arc, 360.0))
      .otherwise(posMod(rxLon - arc, 360.0))
    val vLon1 = when(vLon0 > 180, -(lit(360.0) - vLon0)).otherwise(vLon0)
    // Off-track (or NaN-longitude) => use the endpoint nearest a pole.
    val offTrack = vLon1 < least(txLon, rxLon) || vLon1 > greatest(txLon, rxLon)
    val maxAbs = maxByAbs(txLat, rxLat)
    val fLat = when(offTrack, maxAbs).otherwise(vLat)
    val fLon = when(offTrack, when(maxAbs === txLat, txLon).otherwise(rxLon))
      .otherwise(vLon1)
    struct(fLat.as("vlat"), fLon.as("vlon"))
  }

  /** Frequency (MHz) -> wavelength band code. 18-entry map keyed by
    * trunc(10 * MHz), default 9999. Ref: wsprnet_azi_calc.py:55-75, :137-139.
    * The key truncates toward zero (Python int()), which is Spark's double->int
    * cast; the DuckDB oracle must use trunc() since DuckDB's cast rounds. */
  val freqToBand: Map[Int, Int] = Map(
    1 -> 2200, 4 -> 630, 18 -> 160, 35 -> 80, 52 -> 60, 53 -> 60, 70 -> 40,
    101 -> 30, 140 -> 20, 181 -> 17, 210 -> 15, 249 -> 12, 281 -> 10,
    502 -> 6, 700 -> 4, 1444 -> 2, 4323 -> 70, 12965 -> 23)

  def bandOf(mhz: Column): Column = {
    val key = (lit(10.0) * mhz).cast("int")
    coalesce(element_at(typedLit(freqToBand), key), lit(9999))
  }
}
