package graft.core

import GeoMath._

/** Great-circle / geodesic distances (engine-layer operators; absent from the
  * reference, named in the north star). Formulas: haversine (standard sphere),
  * Vincenty inverse (Vincenty 1975). */
object Dist {

  /** Haversine distance in metres on the mean sphere R = 6371008.8 m. */
  def haversine(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val phi1 = toRadians(lat1); val phi2 = toRadians(lat2)
    val dPhi = toRadians(lat2 - lat1)
    val dLam = toRadians(lon2 - lon1)
    val sp = math.sin(dPhi / 2); val sl = math.sin(dLam / 2)
    val h = sp * sp + math.cos(phi1) * math.cos(phi2) * sl * sl
    2.0 * MeanEarthRadiusM * math.asin(math.min(1.0, math.sqrt(h)))
  }

  /** Vincenty inverse geodesic distance in metres on an ellipsoid (a, f).
    * NaN on non-convergence (near-antipodal points), like the published
    * algorithm's failure mode. Bounded at 200 iterations. */
  def vincenty(lat1: Double, lon1: Double, lat2: Double, lon2: Double,
               a: Double, f: Double): Double = {
    if (lat1 == lat2 && lon1 == lon2) return 0.0
    val b = a * (1.0 - f)
    val l = toRadians(lon2 - lon1)
    val u1 = math.atan((1.0 - f) * math.tan(toRadians(lat1)))
    val u2 = math.atan((1.0 - f) * math.tan(toRadians(lat2)))
    val su1 = math.sin(u1); val cu1 = math.cos(u1)
    val su2 = math.sin(u2); val cu2 = math.cos(u2)

    var lambda = l
    var iter = 0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    var converged = false
    while (iter < 200 && !converged) {
      val sl = math.sin(lambda); val cl = math.cos(lambda)
      sinSigma = math.sqrt(
        (cu2 * sl) * (cu2 * sl) +
          (cu1 * su2 - su1 * cu2 * cl) * (cu1 * su2 - su1 * cu2 * cl))
      if (sinSigma == 0.0) return 0.0 // coincident
      cosSigma = su1 * su2 + cu1 * cu2 * cl
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cu1 * cu2 * sl / sinSigma
      cosSqAlpha = 1.0 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0.0) 0.0 else cosSigma - 2.0 * su1 * su2 / cosSqAlpha
      val c = f / 16.0 * cosSqAlpha * (4.0 + f * (4.0 - 3.0 * cosSqAlpha))
      val lambdaPrev = lambda
      lambda = l + (1.0 - c) * f * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - lambdaPrev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) return Double.NaN
    val uSq = cosSqAlpha * (a * a - b * b) / (b * b)
    val bigA = 1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq)))
    val bigB = uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4.0 *
      (cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM) -
        bigB / 6.0 * cos2SigmaM * (-3.0 + 4.0 * sinSigma * sinSigma) *
          (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM)))
    b * bigA * (sigma - deltaSigma)
  }

  /** WGS84 Vincenty. */
  def vincentyWgs84(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    vincenty(lat1, lon1, lat2, lon2, 6378137.0, 1.0 / 298.257223563)
}
