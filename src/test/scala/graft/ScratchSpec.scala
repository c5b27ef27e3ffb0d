package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Scratch

/** Scratch-space contract: base resolution order and per-call isolation. */
class ScratchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("default base is tmpdir; every call is a fresh directory") {
    val (d1, d2) = (Scratch.dir(spark, "probe"), Scratch.dir(spark, "probe"))
    assert(d1 !== d2, "two calls must never share a path (concurrent-session race)")
    val tmp = System.getProperty("java.io.tmpdir").stripSuffix("/")
    assert(d1.startsWith(tmp + "/probe_"))
  }

  test("spark.graft.scratch conf overrides the default (cluster-shared base)") {
    spark.conf.set("spark.graft.scratch", "/tmp/graft_scratch_conf/")
    try {
      assert(Scratch.base(spark) === "/tmp/graft_scratch_conf")
      assert(Scratch.dir(spark, "x").startsWith("/tmp/graft_scratch_conf/x_"))
    } finally spark.conf.unset("spark.graft.scratch")
  }
}
