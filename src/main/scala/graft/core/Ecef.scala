package graft.core

import GeoMath._

/** Geodetic <-> Earth-Centred-Earth-Fixed conversions.
  *
  * geoToEcef follows the standard closed form (reference:
  * source/coordinate/conv.d:268-289, which is correct: e² = 2f−f² computed
  * locally). ecefToGeo uses Bowring's method; the reference's version feeds it
  * broken eccentricity accessors (datums.d:65-74, quirk Q5) so it is
  * numerically wrong — we implement the correct published formulas and
  * document the divergence.
  */
object Ecef {

  /** Returns Array(x, y, z) metres. `h` in metres (NaN treated as 0 — the
    * reference propagates NaN altitude into all of x/y/z). */
  def geoToEcef(lat: Double, lon: Double, h0: Double, a: Double, f: Double): Array[Double] = {
    val h = if (h0.isNaN) 0.0 else h0
    val phi = toRadians(lat)
    val lambda = toRadians(lon)
    val sphi = math.sin(phi); val cphi = math.cos(phi)
    val slam = math.sin(lambda); val clam = math.cos(lambda)
    val e2 = f * (2.0 - f)
    val nu = a / math.sqrt(1.0 - e2 * sphi * sphi) // prime-vertical curvature radius
    Array((nu + h) * cphi * clam, (nu + h) * cphi * slam, (nu * (1.0 - e2) + h) * sphi)
  }

  /** Bowring's method. Returns Array(lat, lon, h). */
  def ecefToGeo(x: Double, y: Double, z: Double, a: Double, f: Double): Array[Double] = {
    val e2 = f * (2.0 - f)
    val b = a * (1.0 - f)
    val ep2 = e2 / ((1.0 - f) * (1.0 - f))
    val p = math.sqrt(x * x + y * y)
    if (p < 1e-12) { // on the polar axis
      val lat = if (z >= 0) 90.0 else -90.0
      return Array(lat, 0.0, math.abs(z) - b)
    }
    val r = math.sqrt(p * p + z * z)
    // parametric latitude (Bowring eq 17)
    val tbeta = (b * z) / (a * p) * (1.0 + ep2 * b / r)
    val sbeta = tbeta / math.sqrt(1.0 + tbeta * tbeta)
    val cbeta = sbeta / tbeta
    // geodetic latitude (Bowring eq 18)
    val phi =
      if (cbeta.isNaN) 0.0
      else math.atan2(z + ep2 * b * sbeta * sbeta * sbeta, p - e2 * a * cbeta * cbeta * cbeta)
    val lambda = math.atan2(y, x)
    val sphi = math.sin(phi); val cphi = math.cos(phi)
    val nu = a / math.sqrt(1.0 - e2 * sphi * sphi)
    val h = p * cphi + z * sphi - a * a / nu
    Array(toDegrees(phi), toDegrees(lambda), h)
  }
}
