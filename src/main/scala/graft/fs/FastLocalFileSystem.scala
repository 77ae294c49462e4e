package graft.fs

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local-filesystem implementation that answers permission and symlink
  * probes through `java.nio` instead of forking shell commands.
  *
  * Why it exists (optimization guide §1/§7 — measured, not guessed): the
  * sandbox ships no native Hadoop library (`libhadoop.so`), so stock
  * `RawLocalFileSystem` falls back to `Shell.execCommand` for
  * `setPermission` (a `chmod` fork per created file/dir) and for
  * `getFileLinkStatus` (a `readlink` fork per `FileSystem.rename`, which
  * every checkpoint/WAL/control-file publish performs). A fork count of
  * `/proc/stat` across one streaming scenario measured ~1,200 `readlink`
  * + ~550 `chmod` forks — each a process spawn from an 8 GiB JVM — pure
  * fixed cost multiplied across every micro-batch of every declared
  * streaming query. Production clusters install the native library for
  * exactly this reason; this class is the no-native-lib equivalent,
  * wired in via `core-site.xml` (`fs.file.impl`), the standard Hadoop
  * override point. Scope: the `file://` scheme only — HDFS/S3 paths are
  * untouched, and behavior (checksums, rename semantics, permission
  * bits) is identical to `LocalFileSystem`.
  */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

class FastRawLocalFileSystem extends RawLocalFileSystem {

  /** `chmod` fork → `Files.setPosixFilePermissions`. The sticky/setuid
    * bits (not expressible in PosixFilePermission) fall back to the
    * shell path — no caller here sets them. */
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null || (permission.toShort & 0xe00) != 0) {
      super.setPermission(p, permission)
    } else {
      val perms = new java.util.HashSet[PosixFilePermission]()
      val bits = permission.toShort.toInt
      def add(bit: Int, perm: PosixFilePermission): Unit =
        if ((bits & bit) != 0) { perms.add(perm); () }
      add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
      add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
      add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
      // non-POSIX filesystems (Windows, some mounts) don't support
      // PosixFilePermission — fall back to the stock shell/native path
      // there instead of failing the operation (r21 ADVICE)
      try { java.nio.file.Files.setPosixFilePermissions(
        pathToFile(p).toPath, perms); () }
      catch {
        case _: UnsupportedOperationException =>
          super.setPermission(p, permission)
      }
    }
  }

  /** `readlink` fork → `Files.isSymbolicLink`. `FileSystem.rename`
    * probes the source's link status on every call; real symlinks (never
    * created by this engine) still take the stock path. */
  override def getFileLinkStatus(f: Path): FileStatus = {
    val file = pathToFile(f)
    if (java.nio.file.Files.isSymbolicLink(file.toPath)) super.getFileLinkStatus(f)
    else getFileStatus(f)
  }
}
