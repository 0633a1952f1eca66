package graft.sources

/** Test-scope forwarder: exposes the package-private bin-packer to
  * property specs outside this package.
  */
object AuditStreamSourceTestHook {
  def binPack(files: Seq[(String, Long, Int)], cap: Long): Array[Seq[(String, Long, Int)]] =
    AuditMicroBatchStream.binPack(files, cap)
}
