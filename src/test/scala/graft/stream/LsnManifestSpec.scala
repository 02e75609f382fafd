package graft.stream

import graft.SparkSpec
import graft.util.Fs

/** Unit behavior of the max-LSN manifest: key encoding, atomicity
  * surface (torn/garbage entries are ignored, not fatal), format
  * marker, and drop. The integration contract (resume reads manifest,
  * not data) is pinned in RobustnessSpec / WireSourceSpec.
  */
class LsnManifestSpec extends SparkSpec {

  test("native entries: record/read round-trip, rel-path keys, drop") {
    val root = Fs.tempDir("graft-lsnm")
    try {
      LsnManifest.recordNative(root, s"$root/batch-000.parquet", 42L)
      LsnManifest.recordNative(root, s"$root/sub/batch-001.parquet", 77L)
      val m = LsnManifest.readNative(root)
      assert(m(java.nio.file.Paths.get(s"$root/batch-000.parquet")
        .toAbsolutePath.normalize.toString) == 42L)
      assert(m.values.toSet == Set(42L, 77L))
      // re-record overwrites (idempotent writer retries)
      LsnManifest.recordNative(root, s"$root/batch-000.parquet", 43L)
      assert(LsnManifest.readNative(root).values.toSet == Set(43L, 77L))
      LsnManifest.drop(root, s"$root/batch-000.parquet")
      assert(LsnManifest.readNative(root).values.toSet == Set(77L))
    } finally Fs.deleteRecursively(root)
  }

  test("wire entries + format marker; foreign garbage entries are ignored") {
    val root = Fs.tempDir("graft-lsnw")
    try {
      LsnManifest.recordWire(root, "batch-00000000", 100L, 7L)
      LsnManifest.recordFormat(root, "json")
      val w = LsnManifest.readWire(root)
      assert(w("batch-00000000") == ((100L, 7L)))
      assert(LsnManifest.readFormat(root).contains("json"))
      // wire entries invisible to the native reader and vice versa
      assert(LsnManifest.readNative(root).isEmpty)
      // garbage dropped silently (a foreign writer's partial junk must
      // only cost the fallback scan, never fail resume)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, "_lsnmanifest", "junk.lsn"),
        "w:not,numbers".getBytes)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, "_lsnmanifest", "torn.lsn"),
        "m:12x".getBytes)
      assert(LsnManifest.readWire(root).keySet == Set("batch-00000000"))
      assert(LsnManifest.readNative(root).isEmpty)
      // format marker re-record flips (emit sink idempotence)
      LsnManifest.recordFormat(root, "binary")
      assert(LsnManifest.readFormat(root).contains("binary"))
    } finally Fs.deleteRecursively(root)
  }
}
