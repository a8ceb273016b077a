package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Bench's artifact-dir resolution (ADVICE r15: run from any cwd other
  * than the repo root, the old code silently wrote a mis-stamped
  * bench_r1_driver.json into that cwd). No Spark needed.
  */
class BenchAnchorSpec extends AnyFunSuite {

  test("resolves to the nearest ancestor holding build.sbt") {
    val root = Files.createTempDirectory("graft_anchor_")
    Files.createFile(root.resolve("build.sbt"))
    val deep = Files.createDirectories(root.resolve("tools/sub"))
    assert(Bench.artifactBase(deep) == root)
    assert(Bench.artifactBase(root) == root)
  }

  test("stops at the nearest marker, not a further ancestor's") {
    val outer = Files.createTempDirectory("graft_anchor_outer_")
    Files.createFile(outer.resolve("build.sbt"))
    val inner = Files.createDirectories(outer.resolve("nested/repo"))
    Files.createFile(inner.resolve("build.sbt"))
    val sub = Files.createDirectories(inner.resolve("src"))
    assert(Bench.artifactBase(sub) == inner)
  }

  test("falls back to the start dir when no marker exists within reach") {
    val bare = Files.createDirectories(
      Files.createTempDirectory("graft_anchor_bare_")
        .resolve("a/b/c/d/e/f/g"))
    assert(Bench.artifactBase(bare) == bare)
  }
}
