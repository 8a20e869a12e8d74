package graft.core

/** Free-form coordinate text parsers.
  *
  * Grammar ported 1:1 from the reference's parsers (reference:
  * source/coordinate/latlon.d:196-328, utm.d:184-200, 288-328): DMS,
  * decimal-minute, signed decimal, decimal-comma numbers, cardinal
  * prefix/suffix, the comma-count split heuristic, and the compact MGRS form.
  *
  * Cardinal sign convention: correct mode (default) treats S and W as
  * negative and E as positive; 'O' is accepted as Ouest (negative), which
  * also matches the reference byte-for-byte on 'o'. The reference flips the
  * sign for 'e' as well (latlon.d:275, 280, quirk Q1) — `compat = true`
  * reproduces that.
  */
object Parsers {

  // One coordinate: "D M S" | "D M.m" | "±D.d", '.' or ',' decimals
  // (pattern per latlon.d:271).
  private val CoordRx = ("""(?:(\d{1,3})[^\d.,]+(\d{1,2})[^\d,.]+(\d{1,2}[.,]?\d*))""" +
    """|(?:(\d{1,3})[^\d.,]+(\d{1,2}[.,]?\d*))""" +
    """|(?:([+-]?\d{1,3}[.,]?\d*))""").r

  private def num(s: String): Double = java.lang.Double.parseDouble(s.replace(',', '.'))

  /** d + m/60 + s/3600 (latlon.d:317-328). */
  def toDecimalDegree(parts: Array[Double]): Double = parts.length match {
    case 1 => parts(0)
    case 2 => parts(0) + parts(1) / 60.0
    case 3 => parts(0) + (parts(1) + parts(2) / 60.0) / 60.0
    case _ => Double.NaN
  }

  /** Parse a single latitude-or-longitude string to decimal degrees;
    * NaN when unparseable. */
  def parseCoord(coord0: String, compat: Boolean = false): Double = {
    if (coord0 == null) return Double.NaN
    val stripped = coord0.replaceAll("^[, ]+|[, ]+$", "")
    if (stripped.isEmpty) return Double.NaN
    val c = stripped.toLowerCase
    var sign = 1
    var co = c
    val negatives = if (compat) "seo" else "swo"
    val cardinals = "nseow"
    val first = c.charAt(0)
    val last = c.charAt(c.length - 1)
    if (cardinals.indexOf(first) >= 0) {
      if (negatives.indexOf(first) >= 0) sign = -1
      co = c.substring(1)
    } else if (cardinals.indexOf(last) >= 0) {
      if (negatives.indexOf(last) >= 0) sign = -1
      co = c.substring(0, c.length - 1).trim
    }
    CoordRx.findFirstMatchIn(co) match {
      case Some(m) =>
        val groups = (1 to 6).flatMap(i => Option(m.group(i))).filter(_.nonEmpty)
        if (groups.isEmpty || groups.length > 3) Double.NaN
        else {
          try toDecimalDegree(groups.map(num).toArray) * sign
          catch { case _: NumberFormatException => Double.NaN }
        }
      case None => Double.NaN
    }
  }

  /** Split "lat, lon" free text into the two coordinate substrings via the
    * comma-count heuristic (latlon.d:223-245): 0 or 2 commas -> split the
    * space-separated tokens in half; 1 comma -> split on it; 3 commas ->
    * decimal commas, pair them up. Null when the split fails. */
  def splitLatLon(coord: String): Array[String] = {
    if (coord == null) return null
    val commas = coord.count(_ == ',')
    commas match {
      case 1 =>
        val s = coord.split(",", -1)
        if (s.length == 2) Array(s(0), s(1)) else null
      case 0 | 2 =>
        val a = coord.split(" ", -1)
        if (a.length < 2) null
        else Array(a.slice(0, a.length / 2).mkString(" "), a.slice(a.length / 2, a.length).mkString(" "))
      case 3 =>
        val a = coord.split(",", -1)
        if (a.length != 4) null
        else Array(a(0) + "." + a(1), a(2) + "." + a(3))
      case _ => null
    }
  }

  /** Parse full "lat, lon" text to Array(lat, lon) decimal degrees; null when
    * unparseable or out of bounds (lat [-90,90], lon [-180,180]). */
  def parsePoint(text: String, compat: Boolean = false): Array[Double] = {
    val parts = splitLatLon(text)
    if (parts == null || parts(0).trim.isEmpty || parts(1).trim.isEmpty) return null
    val lat = parseCoord(parts(0), compat)
    val lon = parseCoord(parts(1), compat)
    if (lat.isNaN || lon.isNaN) return null
    if (lat < -90 || lat > 90 || lon < -180 || lon > 180) return null
    Array(lat, lon)
  }

  // "30 N 699327.19 5710155.50" | "56S 335003,521 6252510,623" (utm.d:192).
  private val UtmRx = """(?i)(\d{1,2})\s*([c-x]{1,2}?)\s*(\d+(?:[.,]?\d+))\s(\d+(?:[.,]?\d+))""".r

  /** Parse a UTM string. Returns (zone, letter, easting, northing) where
    * `letter` is a hemisphere or band char; null on failure. The reference's
    * plain `utm(string)` treats the letter as a hemisphere, the `!"band"`
    * variant maps band -> hemisphere (utm.d:160-176). */
  def parseUtm(coord: String): (Int, Char, Double, Double) = {
    if (coord == null) return null
    UtmRx.findFirstMatchIn(coord.trim) match {
      case Some(m) =>
        try {
          (m.group(1).toInt, m.group(2).toUpperCase.charAt(0), num(m.group(3)), num(m.group(4)))
        } catch { case _: NumberFormatException => null }
      case None => null
    }
  }

  // "15S WC 80817 51205" | compact "15SWC8081751205" | comma decimals (utm.d:297).
  private val MgrsRx = """(?i)(\d{1,2})\s*([c-x])\s*([a-z]{2})\s*([\d,.\s]*)""".r

  /** Parse an MGRS string. Returns (zone, band, grid, easting, northing);
    * null on failure. Handles spaced, comma-decimal, and compact forms with
    * the reference's split rules incl. the split-digits-in-half compact case
    * (utm.d:305-324). */
  def parseMgrs(coord: String): (Int, Char, String, Double, Double) = {
    if (coord == null) return null
    val m = MgrsRx.findFirstMatchIn(coord.trim).orNull
    if (m == null) return null
    val zone = m.group(1).toInt
    val band = m.group(2).toUpperCase.charAt(0)
    val grid = m.group(3).toUpperCase
    val rest = m.group(4)
    val commas = rest.count(_ == ',')
    var e: String = ""
    var n: String = ""
    commas match {
      case 1 =>
        val s = rest.split(",", -1)
        e = s(0); n = s(1)
      case 0 | 2 =>
        val a = rest.split(" ", -1)
        e = a.slice(0, a.length / 2).mkString(" ")
        n = a.slice(a.length / 2, a.length).mkString(" ")
      case 3 =>
        val a = rest.split(",", -1)
        if (a.length != 4) return null
        e = a(0) + "." + a(1)
        n = a(2) + "." + a(3)
      case _ => return null
    }
    // no separator between easting and northing (e.g. 15SWC8081751205):
    // split the digit run in half (utm.d:320-324)
    if (e.isEmpty) {
      val half = n.length / 2
      e = n.substring(0, half)
      n = n.substring(half)
    }
    try {
      val easting = num(e.trim)
      val northing = num(n.trim)
      (zone, band, grid, easting, northing)
    } catch { case _: NumberFormatException => null }
  }
}
