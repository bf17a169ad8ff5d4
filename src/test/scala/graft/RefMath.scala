package graft

/** Plain-Scala re-implementation of the reference's per-row math
  * (reference: wsprnet_azi_calc.py:77-140), used as the golden oracle for
  * GeoSpec/EnrichSpec. Mirrors Python semantics exactly — including IEEE
  * NaN comparison behavior (false), unlike the engine's documented NaN
  * divergence (see graft.functions.Geo scaladoc).
  */
object RefMath {

  def locToLatLon(locator: String): (Double, Double) = {
    val l = locator.trim
    val d = l.toCharArray
    var lat = ((d(1) - 65) * 10) + (d(3) - 48) + 0.5 - 90
    var lon = ((d(0) - 65) * 20) + ((d(2) - 48) * 2) + 1.0 - 180
    if (l.length == 6) {
      val base = if (d(4).toInt > 88) 96 else 64
      lat = lat - 0.5 + (d(5) - base) / 24.0 - 1.0 / 48
      lon = lon - 1.0 + (d(4) - base) / 12.0 - 1.0 / 24
    }
    (lat, lon)
  }

  def pyMod(x: Double, m: Double): Double = { val r = x % m; if (r < 0) r + m else r }

  private def maxByAbs(a: Double, b: Double): Double = if (math.abs(a) >= math.abs(b)) a else b

  /** (band, rxAzi, rxLat, rxLon, txAzi, txLat, txLon, vLat, vLon) —
    * wsprnet_azi_calc.py:92-140 line by line. */
  def calculateAzimuth(frequency: Double, txLoc: String, rxLoc: String):
      (Int, Double, Double, Double, Double, Double, Double, Double, Double) = {
    val (txLat, txLon) = locToLatLon(txLoc)
    val (rxLat, rxLon) = locToLatLon(rxLoc)
    val phiTx = math.toRadians(txLat); val lamTx = math.toRadians(txLon)
    val phiRx = math.toRadians(rxLat); val lamRx = math.toRadians(rxLon)
    val dLam = lamTx - lamRx

    val y = math.sin(dLam) * math.cos(phiTx)
    val x = math.cos(phiRx) * math.sin(phiTx) - math.sin(phiRx) * math.cos(phiTx) * math.cos(dLam)
    val rxAzi = pyMod(math.toDegrees(math.atan2(y, x)), 360)

    val p = math.sin(-dLam) * math.cos(phiRx)
    val q = math.cos(phiTx) * math.sin(phiRx) - math.sin(phiTx) * math.cos(phiRx) * math.cos(-dLam)
    val txAzi = pyMod(math.toDegrees(math.atan2(p, q)), 360)

    var vLat = Double.NaN; var vLon = Double.NaN
    if (txLon == rxLon) {
      vLon = txLon
      vLat = maxByAbs(txLat, rxLat)
    } else {
      vLat = math.toDegrees(math.acos(math.sin(math.toRadians(rxAzi)) * math.cos(phiRx)))
    }
    if (vLat > 90.0) vLat = 180 - vLat
    if (rxAzi < 180)
      vLon = pyMod((rxLon + math.toDegrees(math.acos(math.tan(phiRx) / math.tan(math.toRadians(vLat))))) + 360, 360)
    else
      vLon = pyMod((rxLon - math.toDegrees(math.acos(math.tan(phiRx) / math.tan(math.toRadians(vLat))))) + 360, 360)
    if (vLon > 180) vLon = -(360 - vLon)
    if (vLon < math.min(txLon, rxLon) || vLon > math.max(txLon, rxLon)) {
      vLat = maxByAbs(txLat, rxLat)
      vLon = if (vLat == txLat) txLon else rxLon
    }
    val freq = (10 * frequency).toInt
    val band = graft.functions.Geo.freqToBand.getOrElse(freq, 9999)
    (band, rxAzi, rxLat, rxLon, txAzi, txLat, txLon, vLat, vLon)
  }
}
