package graft.pipeline

import graft.intel.IntelDb
import org.scalatest.funsuite.AnyFunSuite

/** The fixture's matching-vs-clean pool contract, pinned per VALUE:
  * every `matching` token must hit the threats db and every `clean` token
  * must hit NOTHING in it. sha512("") sat in cleanHashes for four rounds
  * while its hex contained "c2" and matched the *c2* pure-wildcard threat
  * (round-5 review find) — FIXTURES.md's planting-rate design, the bench
  * workload's match density, and every "clean pools are negatives"
  * expectation silently lied. This spec makes the next tainted pool value
  * a red build instead.
  *
  * The allowlist db is deliberately NOT part of the contract: it holds
  * benign entries (github.com, 8.8.8.8) that clean pools may legitimately
  * hit — the fixture's multi-db scenario depends on that.
  */
class FixturePoolContractSpec extends AnyFunSuite {
  private lazy val threats = IntelDb.build("threats", Fixtures.intelThreats)

  test("every matching string-pool value hits the threats db") {
    Fixtures.matchingStringPool.foreach { v =>
      assert(threats.lookupString(v).nonEmpty, s"matching pool value '$v'")
    }
  }

  test("every clean string-pool value misses the threats db") {
    Fixtures.cleanStringPool.foreach { v =>
      assert(threats.lookupString(v).isEmpty,
        s"'clean' pool value '$v' matches threats entries " +
          threats.lookupString(v).mkString("[", ",", "]"))
    }
  }

  test("every matching ip-pool value hits; every clean ip misses") {
    Fixtures.matchingIpPool.foreach { case (ip, v6) =>
      assert(threats.lookupIp(ip, isV6 = v6) != null, s"matching ip '$ip'")
    }
    Fixtures.cleanIpPool.foreach { case (ip, v6) =>
      assert(threats.lookupIp(ip, isV6 = v6) == null, s"'clean' ip '$ip'")
    }
  }
}
