package graft

/** Test stand-ins for remote FileSystem schemes: RawLocalFileSystem
  * re-rooted under a remote URI, so `s3a://graft-bucket/<local path>`
  * reads the local file — the standard Hadoop-test trick for
  * exercising a scheme's full resolution path (conf lookup, checkPath,
  * splits) without the connector jar on the classpath. */
class MockS3FileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("s3a://graft-bucket")
}

class MockHdfsFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("hdfs://graft-nn")
}
