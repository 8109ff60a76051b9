package graft.sources

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file://` filesystem with the chmod fork removed (guide §6: I/O cost).
  *
  * Without libhadoop (no native IO — the common case in containers and CI),
  * `RawLocalFileSystem.setPermission` shells out to `/bin/chmod`, and the
  * default create/mkdirs paths call it for EVERY file and directory. On this
  * engine's metadata-heavy commit protocol (registry + snapshot + marker +
  * lock files per commit, each with a `.crc` sidecar = 2 creates), those
  * forks dominate small-commit latency: measured locally, 400 checksummed
  * creates cost 5.5 s stock vs 0.38 s with setPermission a no-op — ~13 ms
  * vs ~1 ms per file, a 14x difference that is pure subprocess overhead.
  *
  * POSIX permissions on a LOCAL warehouse convey nothing this engine uses
  * (no multi-tenant enforcement reads them back; umask still governs the
  * bits files actually get), so the no-op is semantically free. Scheme-
  * bound: registered for `file://` only (`core-site.xml`), so HDFS / object
  * stores — the 100 TB deployments, whose clients never fork — are
  * untouched, and checksum semantics are inherited unchanged from
  * [[LocalFileSystem]] (the `.crc` sidecars and their verification remain).
  */
final class NoChmodRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}

final class FastLocalFileSystem
    extends LocalFileSystem(new NoChmodRawLocalFileSystem)
