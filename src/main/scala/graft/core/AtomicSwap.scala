package graft.core

import java.nio.file.{Files, Path}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** Atomic directory replacement for concurrent readers — the Delta-style
  * "manifest points at the live version" pattern done with the
  * filesystem's own atomic pointer (SURVEY.md §7.4 item 2; round-2
  * VERDICT item 4).
  *
  * The visible name (`srvid=N`, `dbid=M`, …) is a SYMLINK to a
  * dot-prefixed version directory next to it (`.v000007_srvid=N`).
  * Replacement writes the new version beside the old one — dot-prefixed
  * names are invisible to Spark's file listing — then flips the symlink
  * with a single atomic rename.
  *
  * Reader guarantee (and its honest limit): every read observes exactly
  * one complete version — never an absent, empty, or mixed partition,
  * which were all silent-wrong-answer windows of the previous
  * delete-then-move swap (a recursive delete is arbitrarily long). The
  * residual window is LOUD, not silent: a query that listed files
  * before a flip and opens them after it fails with
  * FileNotFoundException and succeeds on retry — the same
  * plan-vs-execute race every non-transactional table format has. The
  * immediate predecessor version is retained until the next swap so
  * in-flight readers holding open file handles (POSIX keeps unlinked
  * inodes readable) finish undisturbed. On a cluster object store this
  * whole object is replaced by a Delta/Iceberg manifest commit, which
  * also closes the list-vs-open race; the mutation protocol is
  * identical, only the pointer medium changes.
  */
object AtomicSwap {

  private def versionName(ver: Long, linkName: String): String =
    f".v$ver%06d_$linkName"
  private def suffix(linkName: String) = s"_$linkName"

  /** Highest existing version for this link, plus one. */
  private def nextVersion(parent: Path, linkName: String): Long = {
    if (!Files.isDirectory(parent)) return 1L
    val sfx = suffix(linkName)
    val s = Files.list(parent)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith(".v") && n.endsWith(sfx))
      .map(_.stripPrefix(".v").stripSuffix(sfx).toLong)
      .foldLeft(0L)(math.max) + 1L
    finally s.close()
  }

  /** Replace `parent/linkName` with a directory produced by `write`.
    * `write` receives the (not yet existing) version directory path and
    * must create it with the new content; the flip to visibility is one
    * atomic rename. Returns after old versions (except the immediate
    * predecessor) are GC'd. */
  def replace(parent: Path, linkName: String)(write: Path => Unit): Unit = {
    val ver = nextVersion(parent, linkName)
    val vdir = parent.resolve(versionName(ver, linkName))
    write(vdir)
    val dst = parent.resolve(linkName)
    if (Files.isSymbolicLink(dst)) {
      // steady state: flip the pointer atomically, keep one predecessor
      val prev = Files.readSymbolicLink(dst).getFileName.toString
      val tmpLink = parent.resolve(s".swap_$linkName")
      Files.deleteIfExists(tmpLink)
      Files.createSymbolicLink(tmpLink, vdir.getFileName)
      Files.move(tmpLink, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      gc(parent, linkName, keep = Set(vdir.getFileName.toString, prev),
        flipped = ver)
    } else if (Files.isDirectory(dst)) {
      // one-time conversion of a legacy real directory (two renames
      // apart — the only non-atomic moment in the layout's lifetime)
      val aside = parent.resolve(s".gc_$linkName")
      deleteRecursively(aside)
      Files.move(dst, aside)
      Files.createSymbolicLink(dst, vdir.getFileName)
      deleteRecursively(aside)
      gc(parent, linkName, keep = Set(vdir.getFileName.toString),
        flipped = ver)
    } else {
      Files.createDirectories(parent)
      Files.deleteIfExists(dst) // dangling link from a partial crash
      Files.createSymbolicLink(dst, vdir.getFileName)
      gc(parent, linkName, keep = Set(vdir.getFileName.toString),
        flipped = ver)
    }
  }

  /** Drop the link and every version directory. The pointer goes first,
    * so readers stop seeing the partition atomically. Like replace(),
    * drop() assumes a single mutator per link (the per-srvid snapshot
    * lock / registry lock provide that). */
  def drop(parent: Path, linkName: String): Unit = {
    val dst = parent.resolve(linkName)
    if (Files.isSymbolicLink(dst)) Files.delete(dst)
    else deleteRecursively(dst) // legacy real directory
    gc(parent, linkName, keep = Set.empty, flipped = Long.MaxValue)
  }

  /** Delete version dirs not in `keep` plus crash leftovers. Dirs with
    * a version NEWER than the one just flipped to are skipped: they can
    * only belong to a concurrent writer mid-replace (possible when the
    * caller's single-mutator discipline slips), and deleting one would
    * leave that writer flipping the link to a vanished target. */
  private def gc(parent: Path, linkName: String, keep: Set[String],
      flipped: Long): Unit = {
    if (!Files.isDirectory(parent)) return
    val sfx = suffix(linkName)
    val s = Files.list(parent)
    val doomed = try s.iterator().asScala.filter { p =>
      val n = p.getFileName.toString
      (n.startsWith(".v") && n.endsWith(sfx) && !keep.contains(n) &&
        scala.util.Try(
          n.stripPrefix(".v").stripSuffix(sfx).toLong).toOption
          .forall(_ <= flipped)) ||
        n == s".swap_$linkName" || n == s".gc_$linkName"
    }.toList
    finally s.close()
    doomed.foreach(deleteRecursively)
  }

  /** Symlink-aware recursive delete: a link argument removes only the
    * link; links encountered inside a tree are removed, never followed. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      if (Files.isSymbolicLink(p)) Files.delete(p)
      else Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
}
