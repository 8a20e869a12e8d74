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
