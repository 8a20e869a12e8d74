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
  // (pattern per latlon.d:271). Kept as documentation AND as the oracle the
  // hand-rolled scanner below is differential-tested against (ParsersSpec):
  //   (?:(\d{1,3})[^\d.,]+(\d{1,2})[^\d,.]+(\d{1,2}[.,]?\d*))
  //   |(?:(\d{1,3})[^\d.,]+(\d{1,2}[.,]?\d*))
  //   |(?:([+-]?\d{1,3}[.,]?\d*))
  // The scanner replaces `CoordRx.findFirstMatchIn` because this runs once
  // per span in the flagship pipeline and the regex engine (plus the
  // per-call Pattern compile String.replaceAll hides) was ~80% of the parse
  // kernel's cost (2.7 us -> 0.6 us per point measured).
  val CoordRxSource: String = """(?:(\d{1,3})[^\d.,]+(\d{1,2})[^\d,.]+(\d{1,2}[.,]?\d*))""" +
    """|(?:(\d{1,3})[^\d.,]+(\d{1,2}[.,]?\d*))""" +
    """|(?:([+-]?\d{1,3}[.,]?\d*))"""

  private def num(s: String): Double = java.lang.Double.parseDouble(s.replace(',', '.'))

  @inline private def dig(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def stripCh(c: Char): Boolean = c == ',' || c == ' '

  /** Exact replacement for `replaceAll("^[, ]+|[, ]+$", "")` without the
    * per-call Pattern compile. Matches Java regex semantics bit-for-bit,
    * including the quirk that `$` (no MULTILINE) also asserts before a FINAL
    * line terminator — so ", x, \n" strips to "x\n", not ", x, \n". */
  private def stripSep(s: String): String = {
    val n = s.length
    var b = 0
    while (b < n && stripCh(s.charAt(b))) b += 1
    if (b == n) return ""
    val last = s.charAt(n - 1)
    // $ can assert before a final \n / \r\n / \r / NEL / LS / PS
    var termStart = -1
    if (last == '\n') termStart = if (n - 2 >= b && s.charAt(n - 2) == '\r') n - 2 else n - 1
    else if (last == '\r' || last == '\u0085' || last == '\u2028' || last == '\u2029')
      termStart = n - 1
    if (termStart >= 0) {
      var t = termStart
      while (t > b && stripCh(s.charAt(t - 1))) t -= 1
      if (b == 0 && t == termStart) s
      else s.substring(b, t) + s.substring(termStart, n)
    } else {
      var e = n
      while (e > b && stripCh(s.charAt(e - 1))) e -= 1
      if (b == 0 && e == n) s else s.substring(b, e)
    }
  }

  private def digitRun(s: String, i: Int): Int = {
    val n = s.length
    var j = i
    while (j < n && dig(s.charAt(j))) j += 1
    j - i
  }

  /** Length of a `[^\d.,]+` separator run starting at i (0 when none). */
  private def sepRun(s: String, i: Int): Int = {
    val n = s.length
    var j = i
    while (j < n && { val c = s.charAt(j); !dig(c) && c != '.' && c != ',' }) j += 1
    j - i
  }

  /** End index of a `\d{1,maxFirst}[.,]?\d*` group whose digit run starts at
    * `start` with length `runLen` (>= 1). Greedy-regex law: a run longer
    * than maxFirst swallows the WHOLE run and can never take a fraction
    * (the optional [.,] is consumed EMPTY mid-run — "123.45" as seconds
    * matches "123", not "123.45"); a run within maxFirst takes an optional
    * [.,] plus any following digits. */
  private def numGroupEnd(s: String, start: Int, runLen: Int, maxFirst: Int): Int = {
    val afterRun = start + runLen
    if (runLen <= maxFirst && afterRun < s.length &&
      { val c = s.charAt(afterRun); c == '.' || c == ',' })
      afterRun + 1 + digitRun(s, afterRun + 1)
    else afterRun
  }

  /** First match of the coordinate grammar in `co` -> decimal degrees; NaN
    * when nothing matches. Reproduces `CoordRxSource.findFirstMatchIn`
    * exactly: leftmost start position wins, and at a given position the
    * DMS alternative is tried before decimal-minute before signed-decimal.
    * Only a digit (or a sign directly before a digit) can start any
    * alternative, and the signed-decimal alternative always succeeds on a
    * bare digit run — so the first such position is THE match position. */
  private def scanCoord(co: String): Double = {
    val n = co.length
    var p = 0
    while (p < n) {
      val c = co.charAt(p)
      if (dig(c)) return matchAt(co, p, signed = false)
      if ((c == '+' || c == '-') && p + 1 < n && dig(co.charAt(p + 1)))
        return matchAt(co, p, signed = true)
      p += 1
    }
    Double.NaN
  }

  private def matchAt(s: String, p0: Int, signed: Boolean): Double = {
    if (!signed) {
      // alt1 (DMS) / alt2 (decimal-minute) both open with \d{1,3} followed
      // by a non-empty separator; a degree run longer than 3 digits can
      // never match them (the separator class excludes digits, so the
      // quantifier cannot backtrack into a digit run)
      val l1 = digitRun(s, p0)
      if (l1 <= 3) {
        val sep1 = sepRun(s, p0 + l1)
        if (sep1 > 0) {
          val g2s = p0 + l1 + sep1
          val l2 = digitRun(s, g2s)
          if (l2 > 0) {
            // alt1: minutes are a PLAIN \d{1,2} (no fraction), then a second
            // separator and a seconds group
            if (l2 <= 2) {
              val sep2 = sepRun(s, g2s + l2)
              if (sep2 > 0) {
                val g3s = g2s + l2 + sep2
                val l3 = digitRun(s, g3s)
                if (l3 > 0) {
                  val g3e = numGroupEnd(s, g3s, l3, 2)
                  val d = java.lang.Double.parseDouble(s.substring(p0, p0 + l1))
                  val m = java.lang.Double.parseDouble(s.substring(g2s, g2s + l2))
                  val sec = num(s.substring(g3s, g3e))
                  return d + (m + sec / 60.0) / 60.0
                }
              }
            }
            // alt2: decimal minutes
            val g2e = numGroupEnd(s, g2s, l2, 2)
            val d = java.lang.Double.parseDouble(s.substring(p0, p0 + l1))
            val m = num(s.substring(g2s, g2e))
            return d + m / 60.0
          }
        }
      }
    }
    // alt3: [+-]?\d{1,3}[.,]?\d*
    val ds = if (signed) p0 + 1 else p0
    val ge = numGroupEnd(s, ds, digitRun(s, ds), 3)
    num(s.substring(p0, ge))
  }

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
    val stripped = stripSep(coord0)
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
    try scanCoord(co) * sign
    catch { case _: NumberFormatException => Double.NaN }
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
