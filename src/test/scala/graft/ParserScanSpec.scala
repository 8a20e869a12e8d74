package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Parsers

/** Differential gate for the hand-rolled coordinate scanner: the ORIGINAL
  * regex implementation of parseCoord (replaceAll strip + CoordRx
  * findFirstMatchIn, verbatim from the pre-scanner code) is kept here as the
  * oracle and hammered against the scanner with grammar samples, mutated
  * grammar samples, random ASCII, and unicode/terminator edge cases. Any
  * divergence is a bug in the scanner — the regex IS the grammar
  * (reference: source/coordinate/latlon.d:271). */
class ParserScanSpec extends AnyFunSuite {

  private val CoordRx = Parsers.CoordRxSource.r

  /** The pre-scanner implementation, byte-for-byte. */
  private def refParseCoord(coord0: String, compat: Boolean = false): Double = {
    def num(s: String): Double = java.lang.Double.parseDouble(s.replace(',', '.'))
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
          try Parsers.toDecimalDegree(groups.map(num).toArray) * sign
          catch { case _: NumberFormatException => Double.NaN }
        }
      case None => Double.NaN
    }
  }

  private def check(s: String): Unit = {
    for (compat <- Seq(false, true)) {
      val exp = refParseCoord(s, compat)
      val got = Parsers.parseCoord(s, compat)
      assert(
        java.lang.Double.doubleToLongBits(exp) == java.lang.Double.doubleToLongBits(got),
        s"parseCoord(${s.map(ch => f"\\u${ch.toInt}%04x").mkString}|'$s', compat=$compat): regex=$exp scanner=$got")
    }
  }

  private def mix(seed: Long, i: Long): Long = {
    var h = seed ^ (i * 0x9E3779B97F4A7C15L)
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  test("scanner matches regex on hand-picked edge cases") {
    Seq(
      "40.712800", " -74.006000", "51.507400°", "-0.127800°",
      "35° 40' 34.320'' n", "139° 39' 1.080'' e", "-23,550500", "-46,633300",
      "33.868800 s", "151.209300 e", "12 34", "12 34 56", "1234 56 78",
      "12345", "1234.5", "123.45", "123,45", "12.34.56", "1,2,3,4",
      "12.", "12,", ".5", ",5", "+", "-", "+5", "-5", "+-5", "5-", "--5",
      "", " ", ", ", ",,  ,,", "n", "s", "w", "o", "e", "ns", "5n", "n5",
      "12 3456", "1 2 3456", "1 2 123.45", "1 2 1234.5", "0 0 0",
      "999 99 99.999", "12°34'56''", "12d34m56s", "12x34y56z",
      "abc 12 def 34", "x12.5", "12..5", "12,,5", "12.,5",
      "5 n", " w 5", "o12", "12o", "e 12 34", "12 34 e",
      "12\n", "12, \n", ", x, \n", "12, \r\n", "12, \r", "12 ,", " , 12 , ",
      "12, ", "12,  ", "12,  ", "\n12", "a\nb 12",
      "½12", "¾ 56", "𝟏𝟐", "12٠34", "١٢٣", "12 ٣٤", "🌍12.5🌍",
      "İ12", "ı12", "STRASSE 12 34", "ß12", "12 34 ß 56",
      "004 005 006", "00.5", "000", "0001", "+000,5", "-0,",
      "179.999999", "180,000001", "90 0 0.0", "89 59 59.99999")
      .foreach(check)
  }

  test("scanner matches regex on generated grammar + mutation + noise corpus") {
    val alphabet = "0123456789 .,+-°'nsewoNSEWO\"abz½\n\rß \t"
    var i = 0L
    var nonTrivial = 0
    while (i < 120000) {
      val h = mix(0xC0FFEE, i)
      val rng = new java.util.Random(h)
      val kind = rng.nextInt(4)
      val s = kind match {
        case 0 => // grammar-shaped: random render of a random value
          val v = rng.nextDouble() * 400 - 200
          rng.nextInt(5) match {
            case 0 => f"$v%.6f"
            case 1 => f"$v%.6f°"
            case 2 =>
              val av = math.abs(v); val d = av.toInt
              val mF = (av - d) * 60; val m = mF.toInt; val sec = (mF - m) * 60
              f"$d%d° $m%d' $sec%2.3f'' ${if (v >= 0) 'n' else 's'}%c"
            case 3 => f"$v%.6f".replace('.', ',')
            case _ => f"${math.abs(v)}%.6f ${if (v >= 0) "e" else "w"}%s"
          }
        case 1 => // mutated grammar: corrupt 1-3 positions
          val v = rng.nextDouble() * 200 - 100
          val base = new StringBuilder(f"$v%.6f, ${v * 1.7}%.4f")
          (0 to rng.nextInt(3)).foreach { _ =>
            val p = rng.nextInt(base.length)
            base.setCharAt(p, alphabet.charAt(rng.nextInt(alphabet.length)))
          }
          base.toString
        case 2 => // random soup over a parse-relevant alphabet
          val len = rng.nextInt(24)
          (0 until len).map(_ => alphabet.charAt(rng.nextInt(alphabet.length))).mkString
        case _ => // digit-heavy soup: long runs + separators
          val sb = new StringBuilder
          (0 until 1 + rng.nextInt(5)).foreach { _ =>
            sb.append("0123456789".substring(0, 1 + rng.nextInt(9)))
            sb.append(" .,°'x".charAt(rng.nextInt(6)))
          }
          sb.toString
      }
      check(s)
      if (!refParseCoord(s).isNaN) nonTrivial += 1
      i += 1
    }
    // the corpus must actually exercise the match path, not just NaN parity
    assert(nonTrivial > 30000, s"only $nonTrivial non-NaN samples")
  }

  test("full parsePoint differential on mutated two-coordinate strings") {
    var i = 0L
    while (i < 20000) {
      val rng = new java.util.Random(mix(0xBEEF, i))
      val lat = rng.nextDouble() * 220 - 110
      val lon = rng.nextDouble() * 400 - 200
      val base = rng.nextInt(3) match {
        case 0 => f"$lat%.6f, $lon%.6f"
        case 1 => f"${math.abs(lat)}%.5f ${if (lat >= 0) "N" else "S"} ${math.abs(lon)}%.5f ${if (lon >= 0) "E" else "W"}"
        case _ => (f"$lat%.4f, $lon%.4f").replace('.', ',')
      }
      val s = if (rng.nextBoolean()) base else {
        val sb = new StringBuilder(base)
        sb.setCharAt(rng.nextInt(sb.length), "x,.°9 ".charAt(rng.nextInt(6)))
        sb.toString
      }
      // parsePoint pipes through splitLatLon (unchanged) + parseCoord x2:
      // compare against the split + refParseCoord composition
      val parts = Parsers.splitLatLon(s)
      val exp: Array[Double] =
        if (parts == null || parts(0).trim.isEmpty || parts(1).trim.isEmpty) null
        else {
          val la = refParseCoord(parts(0)); val lo = refParseCoord(parts(1))
          if (la.isNaN || lo.isNaN) null
          else if (la < -90 || la > 90 || lo < -180 || lo > 180) null
          else Array(la, lo)
        }
      val got = Parsers.parsePoint(s)
      assert(java.util.Arrays.equals(
        if (exp == null) null else exp.map(java.lang.Double.doubleToLongBits),
        if (got == null) null else got.map(java.lang.Double.doubleToLongBits)),
        s"parsePoint('$s'): regex=${Option(exp).map(_.mkString(","))} scanner=${Option(got).map(_.mkString(","))}")
      i += 1
    }
  }
}
