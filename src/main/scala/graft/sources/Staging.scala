package graft.sources

/** Staging area under /tmp/graft_io for sink outputs, decoded binary
  * drops, and stream-source symlink dirs — keyed by a sanitized slug of
  * the data dir so runs against different sf dirs never collide. The
  * single home for the idiom (was copy-pasted across SourceQueries /
  * MatrixQueries / streaming.Events — round-7 review).
  */
object Staging {
  def dir(dataDir: String, name: String): String =
    s"/tmp/graft_io/${dataDir.replaceAll("[^A-Za-z0-9]", "_")}/$name"
}
