package graft.core

/** Angle wrapping / rounding helpers.
  *
  * Semantics follow the reference library's mathematics module
  * (reference: source/coordinate/mathematics.d:9-68), with `wrap90`
  * implemented as a correct triangle wave for all inputs — the reference's
  * own TODO notes its formula fails for e.g. -315° (mathematics.d:56, quirk Q7).
  * All functions are pure static methods so Catalyst codegen can call them
  * directly via StaticInvoke.
  */
object GeoMath {

  final val MeanEarthRadiusM = 6371008.8 // IUGG mean radius R1 for WGS84

  @inline def toRadians(deg: Double): Double = deg * math.Pi / 180.0
  @inline def toDegrees(rad: Double): Double = rad * 180.0 / math.Pi

  /** Constrain degrees to [0, 360] (bearings). Pass-through when already in
    * range, like the reference (mathematics.d:22). */
  def wrap360(d: Double): Double =
    if (d >= 0.0 && d <= 360.0) d else (d % 360.0 + 360.0) % 360.0

  /** Constrain degrees to [-180, +180] (longitudes). */
  def wrap180(d: Double): Double =
    if (d >= -180.0 && d <= 180.0) d else (d % 360.0 + 540.0) % 360.0 - 180.0

  /** Constrain degrees to [-90, +90] (latitudes); triangle wave with period
    * 360 so 91 -> 89, -91 -> -89, 181 -> -1, -315 -> 45. */
  def wrap90(d: Double): Double = {
    if (d >= -90.0 && d <= 90.0) return d
    val w = wrap360(d)
    if (w <= 90.0) w
    else if (w <= 270.0) 180.0 - w
    else w - 360.0
  }

  /** Quirk Q7 compat: the reference's wrap90 formula verbatim
    * (|((d%360+270)%360-180)|-90, mathematics.d:50-57). Its own TODO notes it
    * is wrong for e.g. -315 deg (returns 135, outside [-90,90]); kept only
    * for bit-parity testing against the reference. */
  def wrap90Compat(d: Double): Double = {
    if (d >= -90.0 && d <= 90.0) return d
    math.abs((d % 360.0 + 270.0) % 360.0 - 180.0) - 90.0
  }

  /** Round to `dec` decimal places, half away from zero (matches the
    * reference's mir round, mathematics.d:64-68). */
  def roundTo(x: Double, dec: Int): Double = {
    val p = math.pow(10.0, dec)
    val v = x * p
    (if (v < 0) -math.round(-v) else math.round(v)) / p
  }

  /** log(x + sqrt(x^2 + 1)); JDK Math has no asinh. */
  def asinh(x: Double): Double = {
    val ax = math.abs(x)
    val r = math.log(ax + math.sqrt(ax * ax + 1.0))
    if (x < 0) -r else r
  }

  /** 0.5 * log((1+x)/(1-x)); JDK Math has no atanh. */
  def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))
}
