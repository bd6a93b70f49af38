package graft.sources

/** The one recursive-delete helper (local-FS fixtures, store/version
  * dir retirement) — previously four identical closures across three
  * files. Does not follow symlinks (File.delete on a link removes the
  * link), which is the behavior every call site wants. */
object FsUtil {
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
