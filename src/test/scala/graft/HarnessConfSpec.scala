package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SPARK_GRAFT_CONF parse is the gate that disables the per-key
  * PartitionPolicy during global sweeps — a false positive silently
  * un-presizes every bench query, a false negative silently defeats
  * the sweep (ADVICE r8: the old substring test had both failure
  * modes). Pure string-level tests; no session needed. */
class HarnessConfSpec extends AnyFunSuite {

  private val P = "spark.sql.shuffle.partitions"

  test("pinning the partitions key disables the policy") {
    assert(!HarnessConf.policyActiveFor(Some(s"$P=64")))
    assert(!HarnessConf.policyActiveFor(Some(s"spark.sql.adaptive.enabled=true,$P=8")))
  }

  test("no env, or entries not touching the key, keep the policy active") {
    assert(HarnessConf.policyActiveFor(None))
    assert(HarnessConf.policyActiveFor(Some("spark.sql.adaptive.enabled=false")))
  }

  test("a VALUE mentioning the key is not a pin (ADVICE r8)") {
    assert(HarnessConf.policyActiveFor(Some(s"spark.app.description=$P")))
  }

  test("a LONGER key with the partitions key as a prefix is not a pin (ADVICE r8)") {
    assert(HarnessConf.policyActiveFor(Some(s"$P.extra=8")))
  }

  test("parse splits on first '=' only and fails loudly on a bare segment") {
    assert(HarnessConf.parseEntries("a=b=c") == Seq(("a", "b=c")))
    val e = intercept[RuntimeException] { HarnessConf.parseEntries("a=1,oops") }
    assert(e.getMessage.contains("oops"))
  }

  test("cpuTicks reads monotone cumulative counters with steal <= total") {
    // /proc/stat is Linux-only: skip (not fail) on hosts where
    // cpuTicks returns its (-1,-1) unreadable sentinel (ADVICE r10).
    assume(HarnessConf.cpuTicks._2 > 0, "/proc/stat not readable here")
    val a = HarnessConf.cpuTicks
    val b = HarnessConf.cpuTicks
    assert(a._2 > 0 && a._1 >= 0 && a._1 <= a._2)
    assert(b._1 >= a._1 && b._2 >= a._2)
  }

  test("stealFrac attributes a window and guards degenerate brackets") {
    assert(HarnessConf.stealFrac((100L, 1000L), (520L, 2000L)) == 0.42)
    assert(HarnessConf.stealFrac((-1L, -1L), (520L, 2000L)) == -1.0)
    assert(HarnessConf.stealFrac((100L, 1000L), (-1L, -1L)) == -1.0)
    assert(HarnessConf.stealFrac((100L, 1000L), (100L, 1000L)) == -1.0)
  }
}
