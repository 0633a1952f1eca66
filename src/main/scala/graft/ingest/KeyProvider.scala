package graft.ingest

/** Pluggable source of the b64 X.509 RSA wrapping key — the seam where an
  * SSM-like parameter store plugs in. The reference fetches the key once
  * per day-batch (audit_data_ingest.py:78, 200-204); here the provider is
  * consulted on the DRIVER at the start of every day and the returned
  * string ships in the task closure (the same per-day hoist), so a
  * long-running deployment can rotate keys between days and executors
  * never need parameter-store access or credentials.
  *
  * A provider backed by a real parameter store should throw
  * [[TransientCredentialsException]] when its own credentials have
  * expired — [[IngestCli]] maps that to a clean warn-and-exit so the
  * scheduler retries the whole run (audit_data_ingest.py:303-308).
  */
trait KeyProvider {
  def wrappingKeyB64(): String
}

/** Static key from config — the zero-egress default. */
final case class StaticKeyProvider(b64: String) extends KeyProvider {
  override def wrappingKeyB64(): String = b64
}
