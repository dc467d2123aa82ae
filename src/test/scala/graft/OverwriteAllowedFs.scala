package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Local filesystem that simulates an S3-like object store's rename
  * semantics: renaming onto an EXISTING destination silently replaces it
  * (S3A emulates rename as copy+delete), instead of refusing like
  * HDFS/ABFS/LocalFileSystem. Registered under the `owfs:` scheme by
  * NotifySourceSpec to prove the notify queue's spool claim mode safe on
  * stores without atomic no-overwrite rename.
  */
class OverwriteAllowedFs extends RawLocalFileSystem {
  override def getScheme: String = "owfs"
  override def getUri: URI = URI.create("owfs:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, true)
    super.rename(src, dst)
  }
}
