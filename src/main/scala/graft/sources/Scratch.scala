package graft.sources

/** JVM-lifetime scratch directories for the on-disk store
  * materializations (dated layout, IVF lists, shingle index, manifest
  * layout, JSONL landing zone, CDC/vacuum round-trip copies). One
  * shutdown hook per dir; the `exists` guard makes cleanup safe when a
  * child (or the whole dir) was already removed — e.g. by a vacuum.
  */
object Scratch {
  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    p.toString
  }
}
