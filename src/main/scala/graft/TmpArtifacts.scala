package graft

/** Shared naming for per-dataset tmp-dir build artifacts (Z-order/sorted/
  * partitioned layouts, format re-encodes, bucketed/MOR tables, sketch
  * tables): the FULL sanitized key — so distinct keys can never collide
  * onto one path — plus a hash suffix covering characters the sanitizer
  * folded together. One definition; every artifact family uses it. */
object TmpArtifacts {
  /** Collision-free directory name for `key`. Never starts with `_` or
    * `.`: Spark's file index treats such names as metadata paths
    * (`InMemoryFileIndex.shouldFilterOutPathName`) and every read of the
    * layout then warns `All paths were ignored` — a `/root/...` key used
    * to sanitize to a leading `_root_...` and trip exactly that. */
  def safeName(key: String): String = {
    val base = key.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(120) + "-" +
      java.lang.Integer.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(key))
    if (base.startsWith("_") || base.startsWith(".")) "d" + base else base
  }

  /** `<baseDir>/<sanitized-key>-<keyhash>` — for callers exposing a
    * configurable base directory. */
  def under(baseDir: String, key: String): String =
    s"$baseDir/${safeName(key)}"

  /** `<java.io.tmpdir>/<family>/<sanitized-key>-<keyhash>` */
  def path(family: String, key: String): String =
    under(s"${sys.props("java.io.tmpdir")}/$family", key)
}
