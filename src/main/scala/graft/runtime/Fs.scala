package graft.runtime

import java.nio.file.{Files, Path}

/** Local-filesystem helpers shared by the materialization/registry seams
  * (single definition — previously four sites re-implemented the
  * walk/reverse/delete idiom).
  */
object Fs {

  /** Delete a file tree, tolerating concurrent/partial deletion. No-op if
    * the path does not exist.
    */
  def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
}
