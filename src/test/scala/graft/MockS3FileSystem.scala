package graft

import java.io.File
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only Hadoop FileSystem registered under the fake scheme
  * `mocks3://`, backed by a local directory — the sandbox's stand-in for
  * the reference's localstack S3 fixture
  * (reference: local/docker-compose.yml, src/s3_download.rs:34-125).
  *
  * Purpose: every prior ETL test exercised the object-store abstraction
  * through `file://` only, which leaves the non-file branch of the
  * Hadoop FS API (authority parsing, qualified-path listing, committer
  * renames under a foreign scheme) unexecuted. This class is NOT a
  * local-path alias: paths keep their `mocks3://bucket/key` form at the
  * API surface (listings and file statuses are translated back), so
  * Spark's scan planning, glob resolution and FileOutputCommitter all
  * run against a genuinely non-`file:` scheme, exactly as they would
  * against s3a. Storage maps `mocks3://bucket/key` →
  * `<fs.mocks3.root>/bucket/key` on local disk.
  *
  * Register with:
  * {{{
  *   hadoopConf.set("fs.mocks3.impl", classOf[MockS3FileSystem].getName)
  *   hadoopConf.set("fs.mocks3.root", "/some/local/dir")
  * }}}
  */
class MockS3FileSystem extends FileSystem {
  private var fsUri: URI = _
  private var rootAbs: String = _
  private var local: RawLocalFileSystem = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    require(name.getAuthority != null && name.getAuthority.nonEmpty,
      s"mocks3 URI needs a bucket authority: $name")
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    val root = conf.get("fs.mocks3.root")
    require(root != null, "fs.mocks3.root must be set to a local directory")
    rootAbs = new File(root).getAbsolutePath
    local = new RawLocalFileSystem()
    local.initialize(URI.create("file:///"), conf)
  }

  override def getScheme: String = "mocks3"
  override def getUri: URI = fsUri

  /** mocks3://bucket/key → file:<root>/bucket/key */
  private def toLocal(p: Path): Path = {
    val u = p.toUri
    val bucket = Option(u.getAuthority).filter(_.nonEmpty)
      .getOrElse(fsUri.getAuthority)
    new Path("file:" + rootAbs + "/" + bucket + u.getPath)
  }

  /** file:<root>/bucket/key → mocks3://bucket/key (inverse of toLocal) */
  private def fromLocal(lp: Path): Path = {
    val abs = lp.toUri.getPath
    require(abs.startsWith(rootAbs), s"local path $abs escapes mocks3 root $rootAbs")
    val rel = abs.stripPrefix(rootAbs).stripPrefix("/")
    val slash = rel.indexOf('/')
    if (rel.isEmpty) new Path(fsUri.toString + "/")
    else if (slash < 0) new Path(s"mocks3://$rel/")
    else new Path("mocks3://" + rel.substring(0, slash) + rel.substring(slash))
  }

  /** Re-home a delegate FileStatus onto the mocks3 scheme. */
  private def st(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime, s.getPermission, s.getOwner,
      s.getGroup, fromLocal(s.getPath))

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(toLocal(f), bufferSize)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    local.create(toLocal(f), permission, overwrite, bufferSize, replication,
      blockSize, progress)

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      "mocks3 is an object store: append is not supported")

  override def rename(src: Path, dst: Path): Boolean =
    local.rename(toLocal(src), toLocal(dst))

  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(toLocal(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(st)

  override def getFileStatus(f: Path): FileStatus =
    st(local.getFileStatus(toLocal(f)))

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(f), permission)

  // Object stores have no cwd; pin it to the bucket root so relative
  // paths qualify against mocks3://bucket/ rather than file:/.
  private var workDir: Path = _
  override def setWorkingDirectory(dir: Path): Unit = workDir = dir
  override def getWorkingDirectory: Path =
    if (workDir != null) workDir else new Path(fsUri.toString + "/")
}
