package graft.core

/** Character-trigram language identification (Cavnar & Trenkle 1994's
  * rank-ordered n-gram profiles, simplified to a fixed-weight match score
  * so the computation has an exact SQL mirror).
  *
  * Each language carries a rank-ordered profile of its most frequent
  * character trigrams (drawn from the published frequency literature for
  * the six languages). A document scores, per language,
  * `sum over profile index i of (K - i) * count_i`, where `count_i` is the
  * number of NON-OVERLAPPING left-to-right occurrences of trigram i in the
  * lower-cased text — exactly the count `(len(t) - len(replace(t, tri, '')))
  * / 3` yields in SQL, which is what the DuckDB oracle mirrors. Argmax wins;
  * ties resolve to the first language in sorted order; all-zero scores
  * return "und".
  *
  * This replaces nothing: the stopword heuristic (TextOps.langId, q42)
  * stays; this is the heavier-duty classifier a real pipeline would use
  * (still a single codegen'd pass per row — no explode, no shuffle).
  */
object LangId {

  /** Rank-ordered trigram profiles (highest-frequency first), sorted by
    * language code. Every trigram is exactly 3 characters. */
  val Profiles: Vector[(String, Array[String])] = Vector(
    "de" -> Array(
      "er ", "en ", "ch ", "der", "ie ", "ein", "sch", "ich", "nde", "die",
      " de", "und", "nd ", "ung", " di", " un", "cht", "ge ", " ge", "ten"),
    "en" -> Array(
      " th", "the", "he ", "ed ", "nd ", " an", "and", " of", "of ", " to",
      "to ", "ing", "ng ", " in", "ion", "ent", " is", "is ", "at ", "es "),
    "es" -> Array(
      " de", "de ", "os ", "la ", " la", "es ", "el ", " el", " co", "ón ",
      "ión", "nte", "en ", " en", "ado", "que", " qu", "ue ", "ar ", "al "),
    "fr" -> Array(
      " de", "es ", "de ", "ent", "le ", "nt ", " le", "la ", " la", "on ",
      "re ", " pa", "ion", " et", "et ", "que", " qu", "ue ", "les", "ais"),
    "it" -> Array(
      " di", "di ", "re ", "la ", " la", "to ", "no ", "one", "zio", "del",
      "che", " ch", "he ", "ell", "are", " pe", "ent", "ta ", "ato", " co"),
    "pt" -> Array(
      " de", "de ", "os ", "ão ", "ção", "ent", "da ", " da", "do ", " do",
      "que", " qu", "ue ", "ar ", "em ", " em", " co", "res", "as ", "ra "))

  /** Non-overlapping left-to-right occurrence count — the semantics of
    * SQL's replace-and-measure idiom, so the oracle mirrors bit-for-bit. */
  private def countOcc(t: String, tri: String): Long = {
    var cnt = 0L
    var idx = t.indexOf(tri)
    while (idx >= 0) { cnt += 1; idx = t.indexOf(tri, idx + tri.length) }
    cnt
  }

  /** Language code with the highest rank-weighted trigram score, "und" when
    * nothing matches. Null-safe. */
  def classify(text: String): String = {
    if (text == null) return null
    val t = text.toLowerCase(java.util.Locale.ROOT)
    var bestLang = "und"
    var bestScore = 0L
    var li = 0
    while (li < Profiles.length) {
      val (lang, tris) = Profiles(li)
      var score = 0L
      var i = 0
      while (i < tris.length) {
        score += (tris.length - i).toLong * countOcc(t, tris(i))
        i += 1
      }
      // strict > : the first sorted language keeps ties
      if (score > bestScore) { bestScore = score; bestLang = lang }
      li += 1
    }
    bestLang
  }
}
