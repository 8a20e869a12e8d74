package graft.core

/** Geohash encode/decode/adjacency (Niemeyer 2008 public scheme).
  *
  * Binary bisection on exactly representable bounds — bit-exact in Double vs
  * the reference (reference: source/coordinate/geohash.d:69-238). This is the
  * engine's primary hierarchical cell index: the adjacency tables below are
  * the primitive under cell-ring kNN expansion and box covering (see Cells).
  */
object Geohash {

  final val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz" // geohash.d:58

  /** Encode to `precision` chars (1..12). Interleaved bisection, 5 bits per
    * char, longitude first on even bits. */
  def encode(lat: Double, lon: Double, precision: Int): String = {
    val p = if (precision < 1) 12 else math.min(precision, 22)
    val sb = new java.lang.StringBuilder(p)
    var idx = 0
    var bit = 0
    var evenBit = true
    var latMin = -90.0; var latMax = 90.0
    var lonMin = -180.0; var lonMax = 180.0
    while (sb.length < p) {
      if (evenBit) {
        val mid = (lonMin + lonMax) / 2
        if (lon >= mid) { idx = idx * 2 + 1; lonMin = mid }
        else { idx = idx * 2; lonMax = mid }
      } else {
        val mid = (latMin + latMax) / 2
        if (lat >= mid) { idx = idx * 2 + 1; latMin = mid }
        else { idx = idx * 2; latMax = mid }
      }
      evenBit = !evenBit
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(idx)); bit = 0; idx = 0 }
    }
    sb.toString
  }

  /** Auto-precision variant: shortest p in 1..12 whose cell centre
    * round-trips the input exactly, else 12 (geohash.d:70-77). */
  def encodeAuto(lat: Double, lon: Double): String = {
    var p = 1
    while (p <= 12) {
      val h = encode(lat, lon, p)
      val c = decode(h)
      if (c(0) == lat && c(1) == lon) return h
      p += 1
    }
    encode(lat, lon, 12)
  }

  /** SW/NE bounds: Array(latMin, lonMin, latMax, lonMax). Null on any
    * character outside the base-32 alphabet. */
  def bounds(geohash: String): Array[Double] = {
    var evenBit = true
    var latMin = -90.0; var latMax = 90.0
    var lonMin = -180.0; var lonMax = 180.0
    var i = 0
    while (i < geohash.length) {
      val c = Character.toLowerCase(geohash.charAt(i))
      val idx = Base32.indexOf(c)
      if (idx < 0) return null
      var n = 4
      while (n >= 0) {
        val bitN = (idx >> n) & 1
        if (evenBit) {
          val mid = (lonMin + lonMax) / 2
          if (bitN == 1) lonMin = mid else lonMax = mid
        } else {
          val mid = (latMin + latMax) / 2
          if (bitN == 1) latMin = mid else latMax = mid
        }
        evenBit = !evenBit
        n -= 1
      }
      i += 1
    }
    Array(latMin, lonMin, latMax, lonMax)
  }

  /** Cell centre as Array(lat, lon); null on invalid hash. */
  def decode(geohash: String): Array[Double] = {
    val b = bounds(geohash)
    if (b == null) null
    else Array((b(0) + b(2)) / 2, (b(1) + b(3)) / 2)
  }

  // Adjacency lookup tables (public tables from the geohash-js scheme,
  // same as geohash.d:210-221). Index 0: odd-length cells, 1: even-length.
  private val Neighbour: Map[Char, Array[String]] = Map(
    'n' -> Array("p0r21436x8zb9dcf5h7kjnmqesgutwvy", "bc01fg45238967deuvhjyznpkmstqrwx"),
    's' -> Array("14365h7k9dcfesgujnmqp0r2twvyx8zb", "238967debc01fg45kmstqrwxuvhjyznp"),
    'e' -> Array("bc01fg45238967deuvhjyznpkmstqrwx", "p0r21436x8zb9dcf5h7kjnmqesgutwvy"),
    'w' -> Array("238967debc01fg45kmstqrwxuvhjyznp", "14365h7k9dcfesgujnmqp0r2twvyx8zb"))
  private val Border: Map[Char, Array[String]] = Map(
    'n' -> Array("prxz", "bcfguvyz"),
    's' -> Array("028b", "0145hjnp"),
    'e' -> Array("bcfguvyz", "prxz"),
    'w' -> Array("0145hjnp", "028b"))

  /** Neighbouring cell in direction n/s/e/w, with recursive border carry
    * into the parent. Null on invalid hash/direction (relaxed mode; the
    * reference throws). */
  def adjacent(geohash: String, direction: Char): String = {
    if (geohash == null || geohash.isEmpty) return null
    val hash = geohash.toLowerCase
    val dir = Character.toLowerCase(direction)
    if (dir != 'n' && dir != 's' && dir != 'e' && dir != 'w') return null
    val lastCh = hash.charAt(hash.length - 1)
    var parent = hash.substring(0, hash.length - 1)
    val tpe = hash.length % 2
    if (Border(dir)(tpe).indexOf(lastCh) != -1 && parent.nonEmpty) {
      parent = adjacent(parent, dir)
      if (parent == null) return null
    }
    val pos = Neighbour(dir)(tpe).indexOf(lastCh)
    if (pos < 0) return null
    parent + Base32.charAt(pos)
  }

  /** All 8 neighbours in fixed order n, ne, e, se, s, sw, w, nw
    * (geohash.d:246-260). Null entries possible at the poles. */
  def neighbours(geohash: String): Array[String] = {
    val n = adjacent(geohash, 'n')
    val s = adjacent(geohash, 's')
    Array(
      n,
      if (n == null) null else adjacent(n, 'e'),
      adjacent(geohash, 'e'),
      if (s == null) null else adjacent(s, 'e'),
      s,
      if (s == null) null else adjacent(s, 'w'),
      adjacent(geohash, 'w'),
      if (n == null) null else adjacent(n, 'w'))
  }
}
