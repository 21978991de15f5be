package graft.util

import java.nio.file.{Files, Path}

/** Temp directories for sink-roundtrip queries, cleaned up recursively at
  * JVM exit (`File.deleteOnExit` is a no-op for non-empty directories, so
  * written parquet/CSV buckets would otherwise accumulate for the life of
  * the machine's temp space).
  */
object TempDirs {
  def create(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(d)))
    d.toString
  }

  private def delete(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        while (it.hasNext) delete(it.next())
      } finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
