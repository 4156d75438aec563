package graft.sources

/** A NON-DEFAULT Hadoop filesystem for tests: the `graftfs://` scheme,
  * backed by the raw local filesystem (no `.crc` sidecars). Registered
  * via `fs.graftfs.impl` — writing a MergeTree tree through it proves
  * the write tier resolves filesystems through Hadoop's registry
  * instead of assuming java.nio, i.e. that `hdfs:`/`s3a:` targets are a
  * configuration concern, not a code path. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}
