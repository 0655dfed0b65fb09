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
    val r = ThreatDbSchema.validate(Seq(e(), e(tl = "bogus")))
    assert(r.isLeft)
    val Left(bad) = r: @unchecked
    assert(bad.size == 1 && bad.head._1 == "1.2.3.4")
  }
  test("fixture feeds are schema-valid") {
    assert(ThreatDbSchema.validate(graft.pipeline.Fixtures.intelThreats).isRight)
    assert(ThreatDbSchema.validate(graft.pipeline.Fixtures.intelAllowlist).isRight)
  }
}
