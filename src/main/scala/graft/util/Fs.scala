package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** Tiny local-fs helpers (test/bench infrastructure only — production
  * paths would go through Hadoop FileSystem).
  */
object Fs {
  def deleteRecursively(root: String): Unit = {
    val p = Paths.get(root)
    // a background writer (e.g. the zone-map sidecar daemon) can drop a
    // file into a directory between the walk listing it and the delete
    // reaching it — re-walk a few times instead of failing the caller
    var attempts = 0
    while (Files.exists(p)) {
      attempts += 1
      try {
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.delete)
      } catch {
        case e @ (_: java.nio.file.DirectoryNotEmptyException |
                  _: java.nio.file.NoSuchFileException |
                  _: java.io.UncheckedIOException) => // lazy-walk wrapper
          if (attempts >= 5) throw e
          Thread.sleep(50L * attempts)
      }
    }
  }

  def listParquet(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Seq.empty
    else Files.walk(p).iterator().asScala
      .filter(f => Files.isRegularFile(f) && f.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSeq
  }

  def tempDir(prefix: String): String =
    sys.env.get("GRAFT_TMPDIR") match {
      case Some(d) => tempDirIn(d, prefix)
      case None => Files.createTempDirectory(prefix).toString
    }

  def tempDirIn(base: String, prefix: String): String = {
    Files.createDirectories(Paths.get(base))
    Files.createTempDirectory(Paths.get(base), prefix).toString
  }
}
