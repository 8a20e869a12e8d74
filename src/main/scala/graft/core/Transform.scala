package graft.core

import GeoMath._

/** Cartesian datum transformations (reference: source/coordinate/transform.d).
  *
  * All small-angle position-vector forms; rotations in arcseconds, scale as a
  * plain factor (callers pass 1 + ds*1e-6 for a ppm value). The reference's
  * "inverse" flag negates all parameters incl. scale, which is only an
  * approximate inverse (transform.d:66-76, quirk Q6) — we expose the same
  * negation convention for parity plus exact round-trip at the engine layer.
  */
object Transform {

  /** 3-parameter shift. Returns Array(x, y, z). */
  def helmert3(x: Double, y: Double, z: Double,
               dx: Double, dy: Double, dz: Double): Array[Double] =
    Array(x + dx, y + dy, z + dz)

  /** 7-parameter Helmert (position-vector small-angle form, transform.d:91-100).
    * `scale` is the full factor (e.g. 1 - 8.3e-6). Set `coordinateFrame` to
    * flip the rotation sign convention; `inverse` negates everything like the
    * reference's Flag!"inverse". */
  def helmert7(x: Double, y: Double, z: Double,
               dx0: Double, dy0: Double, dz0: Double,
               rxArcsec0: Double, ryArcsec0: Double, rzArcsec0: Double,
               scale0: Double,
               coordinateFrame: Boolean = false,
               inverse: Boolean = false): Array[Double] = {
    var dx = dx0; var dy = dy0; var dz = dz0
    var rxA = rxArcsec0; var ryA = ryArcsec0; var rzA = rzArcsec0
    var scale = scale0
    if (coordinateFrame) { rxA = -rxA; ryA = -ryA; rzA = -rzA }
    if (inverse) {
      dx = -dx; dy = -dy; dz = -dz
      rxA = -rxA; ryA = -ryA; rzA = -rzA
      scale = -scale
    }
    val rx = toRadians(rxA / 3600.0)
    val ry = toRadians(ryA / 3600.0)
    val rz = toRadians(rzA / 3600.0)
    Array(
      dx + scale * (x + rz * y - ry * z),
      dy + scale * (-rz * x + y + rx * z),
      dz + scale * (ry * x - rx * y + z))
  }

  /** ppm-convention wrapper: scale factor = 1 + dsPpm*1e-6. */
  def helmert7Ppm(x: Double, y: Double, z: Double,
                  dx: Double, dy: Double, dz: Double,
                  rxArcsec: Double, ryArcsec: Double, rzArcsec: Double,
                  dsPpm: Double): Array[Double] =
    helmert7(x, y, z, dx, dy, dz, rxArcsec, ryArcsec, rzArcsec, 1.0 + dsPpm * 1e-6)

  /** Abridged Molodensky direct geodetic datum shift (the 5-parameter
    * transform the reference declares but leaves as an empty stub,
    * transform.d:151-153 — implemented here from the published formulas,
    * DMA TM 8350.2 / Deakin 2004). Works in geodetic coordinates directly
    * (no ECEF round trip): given a point on the SOURCE ellipsoid (a, f),
    * translation (dx, dy, dz) metres and ellipsoid change (da = aTgt - aSrc,
    * df = fTgt - fSrc), returns Array(lat, lon, h) on the target datum.
    *
    *   dphi    = (-dx sinφ cosλ - dy sinφ sinλ + dz cosφ
    *              + (a·df + f·da) sin 2φ) / M
    *   dlambda = (-dx sinλ + dy cosλ) / (N cosφ)
    *   dh      =  dx cosφ cosλ + dy cosφ sinλ + dz sinφ
    *              + (a·df + f·da) sin²φ - da
    *
    * with M the meridian and N the prime-vertical curvature radius. The
    * abridged form drops the h/M and h/N terms of the full Molodensky
    * series — sub-metre agreement for |h| < 10 km, the published trade-off. */
  def molodenskyAbridged(lat: Double, lon: Double, h0: Double,
                         dx: Double, dy: Double, dz: Double,
                         a: Double, f: Double,
                         da: Double, df: Double): Array[Double] = {
    val h = if (h0.isNaN) 0.0 else h0
    val phi = toRadians(lat)
    val lam = toRadians(lon)
    val sphi = math.sin(phi); val cphi = math.cos(phi)
    val slam = math.sin(lam); val clam = math.cos(lam)
    val e2 = f * (2.0 - f)
    val s2 = 1.0 - e2 * sphi * sphi
    val nN = a / math.sqrt(s2)                    // prime vertical
    val m = a * (1.0 - e2) / (s2 * math.sqrt(s2)) // meridian
    val adffda = a * df + f * da
    val dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi +
      adffda * math.sin(2.0 * phi)) / m
    val dlam = (-dx * slam + dy * clam) / (nN * cphi)
    val dh = dx * cphi * clam + dy * cphi * slam + dz * sphi +
      adffda * sphi * sphi - da
    Array(lat + toDegrees(dphi), lon + toDegrees(dlam), h + dh)
  }

  /** 10-parameter Molodensky-Badekas: Helmert about an explicit rotation
    * origin (transform.d:129-137). Not reversible. */
  def molodenskyBadekas(x: Double, y: Double, z: Double,
                        dx: Double, dy: Double, dz: Double,
                        rxArcsec: Double, ryArcsec: Double, rzArcsec: Double,
                        ox: Double, oy: Double, oz: Double,
                        scale: Double): Array[Double] = {
    val rx = toRadians(rxArcsec / 3600.0)
    val ry = toRadians(ryArcsec / 3600.0)
    val rz = toRadians(rzArcsec / 3600.0)
    val sx = x - ox; val sy = y - oy; val sz = z - oz
    Array(
      (dx + ox) + scale * (sx + rz * sy - ry * sz),
      (dy + oy) + scale * (-rz * sx + sy + rx * sz),
      (dz + oz) + scale * (ry * sx - rx * sy + sz))
  }
}
