package graft.core

import scala.collection.mutable

/** Reference ellipsoid. `a` semi-major axis (m), `b` semi-minor axis (m),
  * `invF` inverse flattening as shipped in the EPSG registry CSV.
  *
  * Derived accessors use the correct geodetic formulas (e² = f(2−f),
  * e′² = e²/(1−f)²). The reference library's accessors misuse the stored
  * inverse flattening (reference: source/coordinate/datums.d:65-74, quirk Q5);
  * we document the divergence rather than reproduce a numerically broken path.
  */
final case class Ellipsoid(epsg: Long, shortName: String, name: String,
                           a: Double, bRaw: Double, invF: Double, comment: String) {
  /** True flattening f. */
  val f: Double =
    if (!invF.isNaN) 1.0 / invF
    else if (!bRaw.isNaN) (a - bRaw) / a
    else Double.NaN
  /** Semi-minor axis. */
  val b: Double = if (!bRaw.isNaN) bRaw else a * (1.0 - f)
  /** First eccentricity squared, e² = f(2−f). */
  val e2: Double = f * (2.0 - f)
  /** Second eccentricity squared, e′² = e²/(1−f)². */
  val ep2: Double = e2 / ((1.0 - f) * (1.0 - f))
}

/** Geodetic datum: named reference frame + ellipsoid (by EPSG id). */
final case class Datum(epsg: Long, shortName: String, name: String,
                       epoch: Long, ellipsoidEpsg: Long, comment: String) {
  def ellipsoid: Ellipsoid = Registry.ellipsoidByEpsg(ellipsoidEpsg)
}

/** Helmert transform parameters to WGS84 (dx/dy/dz m, rx/ry/rz arcsec, ds ppm). */
final case class HelmertParams(datumEpsg: Long, name: String,
                               dx: Double, dy: Double, dz: Double,
                               rx: Double, ry: Double, rz: Double, ds: Double)

/** Static datum/ellipsoid registry loaded from embedded EPSG-derived CSV
  * resources (same data files the reference ships; reference loader:
  * source/coordinate/datums.d:205-387). Rows without a usable EPSG code get
  * synthetic negative keys, mirroring the reference (datums.d:220, 235).
  *
  * Data quirk (inherited VERBATIM from the reference's CSV, which its loader
  * ingests unscaled as `real`, datums.d:219): some semi-major axes carry a
  * dropped decimal point from the EPSG source — e.g. Bessel 1841 (7004) is
  * stored as 6377397155 (nominally mm) while WGS84 is 6378137 (m). Lookups
  * return the stored values bit-for-bit; nothing in the engine's live
  * conversion paths consumes them (defaults are explicit WGS84 literals).
  * Everything is resolved at plan/driver time and is tiny (~500 rows), so
  * expressions can fold the (a, f) pair into constants.
  */
object Registry {

  /** Minimal CSV split honoring double quotes; `#` lines are comments. */
  private[core] def csvRows(resource: String): Iterator[Array[String]] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing resource $resource")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    src.getLines().filter(l => l.nonEmpty && !l.startsWith("#")).map(splitCsv)
  }

  private def splitCsv(line: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQ = !inQ
      else if (c == ',' && !inQ) { out += sb.result().trim; sb.clear() }
      else sb.append(c)
      i += 1
    }
    out += sb.result().trim
    out.toArray
  }

  private def num(s: String): Double =
    if (s.isEmpty || s.equalsIgnoreCase("nan")) Double.NaN
    else java.lang.Double.parseDouble(s)

  val ellipsoids: Vector[Ellipsoid] = {
    var synth = -1L
    csvRows("/graft/data/ellipsoid.csv").map { f =>
      val epsg = if (f(0).nonEmpty) f(0).toLong else { val k = synth; synth -= 1; k }
      Ellipsoid(epsg, f(1), f(2), num(f(3)), num(f(4)), num(f(5)),
        if (f.length > 6) f(6) else "")
    }.toVector
  }

  val datums: Vector[Datum] = {
    var synth = -1L
    csvRows("/graft/data/datum.csv").map { f =>
      val epsg = if (f(0).nonEmpty) f(0).toLong else { val k = synth; synth -= 1; k }
      val epoch = { val v = num(f(3)); if (v.isNaN) 0L else v.toLong }
      val ell = { val v = num(f(4)); if (v.isNaN) 0L else v.toLong }
      Datum(epsg, f(1), f(2), epoch, ell, if (f.length > 5) f(5) else "")
    }.toVector
  }

  /** 7-parameter Helmert shifts per datum (to WGS84). The reference ships
    * this table but never loads it (SURVEY §1.2) — we make it live. */
  val helmert7: Vector[HelmertParams] =
    csvRows("/graft/data/p7transform.csv").map { f =>
      HelmertParams(f(0).toLong, f(1), num(f(2)), num(f(3)), num(f(4)),
        num(f(5)), num(f(6)), num(f(7)), num(f(8)))
    }.toVector

  /** 3-parameter shifts per datum (to WGS84). */
  val helmert3: Vector[HelmertParams] =
    csvRows("/graft/data/p3transform.csv").map { f =>
      HelmertParams(f(0).toLong, f(1), num(f(2)), num(f(3)), num(f(4)), 0, 0, 0, 0)
    }.toVector

  val ellipsoidByEpsg: Map[Long, Ellipsoid] = ellipsoids.map(e => e.epsg -> e).toMap
  val ellipsoidByName: Map[String, Ellipsoid] =
    ellipsoids.map(e => e.shortName.toLowerCase -> e).toMap
  val datumByEpsg: Map[Long, Datum] = datums.map(d => d.epsg -> d).toMap
  val datumByName: Map[String, Datum] = datums.map(d => d.shortName.toLowerCase -> d).toMap
  val helmert7ByDatum: Map[Long, HelmertParams] = helmert7.map(h => h.datumEpsg -> h).toMap

  /** Default datum: EPSG 6326 = WGS84 (reference: datums.d:181, 249). */
  val wgs84Datum: Datum = datumByEpsg(6326L)
  val wgs84: Ellipsoid = ellipsoidByEpsg(7030L)

  /** Resolve "wgs84" / "6326" / "epsg:6326" to a datum; None if unknown. */
  def resolveDatum(nameOrEpsg: String): Option[Datum] = {
    val s = nameOrEpsg.trim.toLowerCase.stripPrefix("epsg:")
    if (s.forall(_.isDigit) && s.nonEmpty) datumByEpsg.get(s.toLong)
    else datumByName.get(s)
  }
}
