package graft

/** Self-cleaning temp dirs for forked test JVMs — without the shutdown
  * hook every suite run leaks its directories into /tmp (hundreds observed
  * on this shared host). */
object TestTmp {
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
      catch { case _: Throwable => () }))
    d.toString
  }
}
