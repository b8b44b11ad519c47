package graft.hadoop

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.{Files, NoSuchFileException}
import java.util.EnumSet

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem for the `file://` scheme with PERMISSION syscalls
  * instead of forked shell-outs (optimization round, guide §1/§7.3).
  *
  * Why this exists: without the native hadoop library (`libhadoop.so`
  * is not shipped in this Spark distribution), Hadoop's
  * `RawLocalFileSystem.setPermission` falls back to
  * `Shell.execCommand("chmod", …)` — a FORKED SUBPROCESS per created
  * file. Thread-dump sampling of the q41-family probes and every
  * parquet-writing path (LSM appends, streaming state/offset/commit
  * logs, staged refreshes) showed executor tasks RUNNABLE inside
  * `ProcessImpl.forkAndExec` via `HadoopOutputFile.create` — file
  * CREATION, not data volume, was the wall. A real cluster never pays
  * this (libhadoop's native chmod is a syscall; object stores have no
  * POSIX permissions at all), so locally it is pure measurement
  * distortion: java.nio's `setPosixFilePermissions` is the same
  * syscall the native path makes.
  *
  * Registered via `spark.hadoop.fs.file.impl` in the Bench/Verify
  * session builders. Extending RawLocalFileSystem (not the
  * ChecksumFileSystem wrapper) also drops the `.crc` sibling writes —
  * the checksum layer exists to catch local-disk corruption on
  * long-lived data; every local artifact here is a scratch/staging
  * path whose integrity the pipelines verify by re-reading through
  * parquet (which carries its own page checksums). Behavior is
  * otherwise inherited unchanged; results are byte-identical.
  */
class NioLocalFileSystem extends RawLocalFileSystem {

  private def toNio(perm: FsPermission): EnumSet[PosixFilePermission] = {
    val bits = perm.toShort.toInt
    val s = EnumSet.noneOf(classOf[PosixFilePermission])
    import PosixFilePermission._
    if ((bits & 0x100) != 0) s.add(OWNER_READ)
    if ((bits & 0x080) != 0) s.add(OWNER_WRITE)
    if ((bits & 0x040) != 0) s.add(OWNER_EXECUTE)
    if ((bits & 0x020) != 0) s.add(GROUP_READ)
    if ((bits & 0x010) != 0) s.add(GROUP_WRITE)
    if ((bits & 0x008) != 0) s.add(GROUP_EXECUTE)
    if ((bits & 0x004) != 0) s.add(OTHERS_READ)
    if ((bits & 0x002) != 0) s.add(OTHERS_WRITE)
    if ((bits & 0x001) != 0) s.add(OTHERS_EXECUTE)
    s
  }

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val f = pathToFile(p)
    try Files.setPosixFilePermissions(f.toPath, toNio(permission))
    catch {
      case e: NoSuchFileException =>
        throw new java.io.FileNotFoundException(
          s"setPermission: ${e.getFile} does not exist")
    }
  }
}
