package graft.intel

import graft.model.IntelEntry
import org.scalatest.funsuite.AnyFunSuite

/** ThreatDB v1 accept/reject vectors
  * (reference tests/schema_validation_test.rs semantics).
  */
class ThreatDbSchemaSpec extends AnyFunSuite {
  private def e(tl: String = "high", cat: String = "c2", src: String = "f",
      conf: Int = 50) = IntelEntry("1.2.3.4", tl, cat, src, conf)

  test("valid entry accepted") {
    assert(ThreatDbSchema.isValid(e()))
    assert(ThreatDbSchema.validate(Seq(e(), e(tl = "low"))).isRight)
  }
  test("invalid threat_level rejected") {
    assert(!ThreatDbSchema.isValid(e(tl = "severe")))
  }
  test("missing category/source rejected") {
    assert(!ThreatDbSchema.isValid(e(cat = "")))
    assert(!ThreatDbSchema.isValid(e(src = "")))
  }
  test("confidence bounds") {
    assert(!ThreatDbSchema.isValid(e(conf = 101)))
    assert(!ThreatDbSchema.isValid(e(conf = -1)))
    assert(ThreatDbSchema.isValid(e(conf = 0)))
    assert(ThreatDbSchema.isValid(e(conf = 100)))
  }
  test("validate reports entry + violation") {
    // DISTINCT keys (round-5 test-review find: identical keys meant a
    // violation paired with the wrong entry still read "1.2.3.4"), and
    // the violation text itself must name the failing field
    val r = ThreatDbSchema.validate(
      Seq(e(), e(tl = "bogus").copy(entry = "9.9.9.9")))
    assert(r.isLeft)
    val Left(bad) = r: @unchecked
    assert(bad.size == 1 && bad.head._1 == "9.9.9.9", bad)
    assert(bad.head._2.contains("threat_level") &&
      bad.head._2.contains("bogus"), bad.head._2)
  }
  test("fixture feeds are schema-valid") {
    assert(ThreatDbSchema.validate(graft.pipeline.Fixtures.intelThreats).isRight)
    assert(ThreatDbSchema.validate(graft.pipeline.Fixtures.intelAllowlist).isRight)
  }
}
