package graft

import org.scalatest.funsuite.AnyFunSuite

/** DEV harness (local iteration against /tmp/zt reference vectors
  * produced by the real zstd CLI). Skips silently when the vectors
  * are absent — the committed coverage lives in ZstdSpec's embedded
  * vectors.
  */
class ZstdDevSpec extends AnyFunSuite {
  test("decoder matches the CLI on every generated vector") {
    val dir = new java.io.File("/tmp/zt")
    assume(dir.isDirectory, "no local vectors")
    val zsts = dir.listFiles().filter(_.getName.endsWith(".zst")).sortBy(_.getName)
    assume(zsts.nonEmpty)
    var checked = 0
    zsts.foreach { f =>
      val comp = java.nio.file.Files.readAllBytes(f.toPath)
      val raw = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f.getName.stripSuffix(".zst") + ".raw").toPath)
      graft.operators.Zstd.decompress(comp) match {
        case Some((frames, _, out)) =>
          assert(frames >= 1L || f.getName.startsWith("skip"), f.getName)
          assert(java.util.Arrays.equals(out, raw),
            s"${f.getName}: got ${out.length} bytes, want ${raw.length}")
          checked += 1
        case None => fail(s"${f.getName}: decoder rejected a valid frame")
      }
    }
    info(s"verified $checked CLI vectors")
  }
}
