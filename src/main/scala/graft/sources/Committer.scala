package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The two filesystem primitives whose ATOMICITY the persistent stores'
  * mutation dances rest on — extracted behind a seam so the HDFS
  * assumption is a pluggable default, not a hard-wired one.
  *
  * Every mutation recipe in the store layer ([[StoreOps.swapWrite]]'s
  * rename-aside swap, [[StoreOps.appendKeyed]]'s batch-keyed file
  * commit, [[MergeStore]]'s per-bucket swap, [[StoreOps.Lease]]'s
  * acquisition) reduces to exactly these:
  *
  *  - [[publishRename]]: move a staged file/directory to its final
  *    name as one atomic metadata op that FAILS (never overwrites) if
  *    the destination exists;
  *  - [[createExclusive]]: publish a small control file (lease) iff
  *    the path does not exist, atomically.
  *
  * [[Committer.Rename]] (the default) maps both to HDFS/posix
  * semantics — `FileSystem.rename` and `create(p, overwrite=false)` —
  * which is today's behavior, byte for byte. On S3-class object stores
  * those calls are NOT atomic (rename is copy+delete, O(bytes));
  * deploying the stores there means installing an implementation that
  * maps them to the store's own conditional primitives, per the SURVEY
  * §5 contract:
  *
  *  - `publishRename` of a FILE → conditional PUT (`If-None-Match: *`)
  *    of the staged bytes under the final key + delete of the staged
  *    key — same idempotence law, because every caller publishes under
  *    a deterministic, collision-free name (batch-keyed file names,
  *    swap target dirs);
  *  - `publishRename` of a DIRECTORY → either a per-file conditional
  *    PUT walk, or a manifest pointer flip (the Iceberg/Delta route) —
  *    the recipes only require all-or-nothing VISIBILITY of the final
  *    name, which a manifest gives for free;
  *  - `createExclusive` → conditional PUT of the lease object.
  *
  * Installation is process-wide ([[Committer.install]]) because a
  * filesystem's semantics are a property of the deployment, not of one
  * store instance. CommitterSpec pins that a custom implementation
  * intercepts every mutation path.
  */
trait Committer {
  /** Atomically move `src` to `dst`; false if the move did not happen
    * (e.g. dst exists). Must never leave a partial dst visible. */
  def publishRename(fs: FileSystem, src: Path, dst: Path): Boolean

  /** Atomically create `p` holding `content` iff it does not exist;
    * throws java.io.IOException when it does. */
  def createExclusive(fs: FileSystem, p: Path, content: Array[Byte]): Unit
}

object Committer {

  /** HDFS/posix semantics — rename IS atomic metadata, create(p, false)
    * IS conditional. The default, and today's exact behavior. */
  object Rename extends Committer {
    override def publishRename(fs: FileSystem, src: Path, dst: Path): Boolean =
      fs.rename(src, dst)
    override def createExclusive(fs: FileSystem, p: Path,
                                 content: Array[Byte]): Unit = {
      val out = fs.create(p, false) // atomic create-no-overwrite
      try out.write(content) finally out.close()
    }
  }

  @volatile private var installed: Committer = Rename

  /** The process-wide committer every store mutation routes through. */
  def current: Committer = installed

  /** Install a deployment-specific committer (object-store conditional
    * PUTs, a manifest ledger). Call once at session setup, before any
    * store mutation. */
  def install(c: Committer): Unit = { installed = c }

  /** Restore the HDFS default (tests). */
  def reset(): Unit = { installed = Rename }
}
