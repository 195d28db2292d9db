package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Deterministically-closed directory listings for specs: the JDK's
  * Files.list/walk streams hold an open directory fd until closed, and
  * GC-lazy reclamation let the full suite hit EMFILE — specs list through
  * here (and the engine through TxnTable's own closing variants). */
object FsTest {
  def list(d: Path): java.util.stream.Stream[Path] = {
    val s = Files.list(d)
    try java.util.Arrays.stream(s.iterator().asScala.toArray)
    finally s.close()
  }
  def walk(d: Path): java.util.stream.Stream[Path] = {
    val s = Files.walk(d)
    try java.util.Arrays.stream(s.iterator().asScala.toArray)
    finally s.close()
  }
}
