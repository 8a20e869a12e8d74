package graft.core

/** Ray-casting point-in-polygon over flat ring arrays.
  *
  * Engine-layer operator (the reference's only containment test is the OLC
  * CodeArea half-open box, openlocationcode.d:491-498, generalized here).
  * Ring: (lat(i), lon(i)) pairs, closed implicitly (last->first edge).
  * Boundary convention: standard even-odd crossing with half-open edges —
  * a point exactly on a lower/left edge counts inside, on the opposing edge
  * outside, so adjacent polygons tile without double-counting.
  */
object Pip {

  /** `ring` packed as [lat0, lon0, lat1, lon1, ...]. */
  def contains(lat: Double, lon: Double, ring: Array[Double]): Boolean = {
    val n = ring.length / 2
    if (n < 3) return false
    var inside = false
    var j = n - 1
    var i = 0
    while (i < n) {
      val yi = ring(2 * i); val xi = ring(2 * i + 1)
      val yj = ring(2 * j); val xj = ring(2 * j + 1)
      if (((yi > lat) != (yj > lat)) &&
          (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Even-odd containment over MULTIPLE rings (polygon with holes and/or
    * multipolygon): a point is inside iff its total crossing count over ALL
    * ring edges is odd. With rings = [outer, hole...] this punches holes;
    * with several disjoint outers it is a multipolygon — the uniform
    * even-odd rule handles both without classifying rings. Rings with fewer
    * than 3 vertices are ignored (degenerate, contribute no area). */
  def containsRings(lat: Double, lon: Double, rings: Array[Array[Double]]): Boolean = {
    if (rings == null) return false
    var crossings = 0
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      if (ring != null && ring.length >= 6) {
        val n = ring.length / 2
        var j = n - 1
        var i = 0
        while (i < n) {
          val yi = ring(2 * i); val xi = ring(2 * i + 1)
          val yj = ring(2 * j); val xj = ring(2 * j + 1)
          if (((yi > lat) != (yj > lat)) &&
              (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) {
            crossings += 1
          }
          j = i
          i += 1
        }
      }
      r += 1
    }
    (crossings & 1) == 1
  }

  /** Bounding box of a packed ring: Array(latMin, lonMin, latMax, lonMax). */
  def bbox(ring: Array[Double]): Array[Double] = {
    var latMin = Double.MaxValue; var latMax = -Double.MaxValue
    var lonMin = Double.MaxValue; var lonMax = -Double.MaxValue
    var i = 0
    while (i < ring.length - 1) {
      val la = ring(i); val lo = ring(i + 1)
      if (la < latMin) latMin = la
      if (la > latMax) latMax = la
      if (lo < lonMin) lonMin = lo
      if (lo > lonMax) lonMax = lo
      i += 2
    }
    Array(latMin, lonMin, latMax, lonMax)
  }

  /** Half-open box containment [s,n) x [w,e) — same convention as the
    * reference's CodeArea.contains. */
  def boxContains(lat: Double, lon: Double,
                  south: Double, west: Double, north: Double, east: Double): Boolean =
    south <= lat && lat < north && west <= lon && lon < east
}
