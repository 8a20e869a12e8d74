package graft.core

/** Typed failure family for strict mode, mirroring the reference's exception
  * hierarchy (reference: source/coordinate/exceptions.d:5-51). The relaxed
  * default returns SQL NULL for invalid input; with `spark.graft.strict=true`
  * the expression layer throws these instead — the fail-fast behavior a
  * data-quality pipeline wants. Message texts follow the reference's
  * enforce() messages (latlon.d:135-136, utm.d:132-133, ...). */
class CoordException(msg: String) extends RuntimeException(msg)

final class LatLonException(msg: String) extends CoordException(msg)
final class EcefException(msg: String) extends CoordException(msg)
final class UtmException(msg: String) extends CoordException("Invalid utm coordinate! " + msg)
final class MgrsException(msg: String) extends CoordException("Invalid mgrs coordinate! " + msg)
final class GeohashException(msg: String) extends CoordException("Invalid geohash! " + msg)
final class OlcException(msg: String) extends CoordException("Invalid open location code! " + msg)
final class DatumException(msg: String) extends CoordException("Invalid datum! " + msg)
