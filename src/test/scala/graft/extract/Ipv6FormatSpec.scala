package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** RFC 5952 canonicalization — must equal Rust `Ipv6Addr::to_string()`
  * (SURVEY.md §7.3 hard part).
  */
class Ipv6FormatSpec extends AnyFunSuite {
  private def c(s: String) = Ipv6Format.canonicalize(s)

  test("basic compression") {
    assert(c("2001:db8:0:0:0:0:0:1") == "2001:db8::1")
    assert(c("2001:db8::1") == "2001:db8::1")
    assert(c("2001:0db8::0001") == "2001:db8::1")
  }
  test("longest zero run wins, leftmost on tie") {
    assert(c("2001:0:0:1:0:0:0:1") == "2001:0:0:1::1")
    assert(c("2001:0:0:1:0:0:1:1") == "2001::1:0:0:1:1")
    assert(c("1:0:0:2:0:0:3:4") == "1::2:0:0:3:4")
  }
  test("single zero group not compressed") {
    assert(c("2001:db8:0:1:1:1:1:1") == "2001:db8:0:1:1:1:1:1")
  }
  test("all zeros / loopback") {
    assert(c("0:0:0:0:0:0:0:0") == "::")
    assert(c("0:0:0:0:0:0:0:1") == "::1")
  }
  test("lowercase hex") {
    assert(c("2001:DB8::ABCD") == "2001:db8::abcd")
  }
  test("ipv4-mapped mixed notation") {
    assert(c("::ffff:192.168.1.1") == "::ffff:192.168.1.1")
    assert(c("0:0:0:0:0:ffff:c0a8:101") == "::ffff:192.168.1.1")
  }
  test("invalid forms rejected") {
    assert(c("1:2:3") == null)
    assert(c("1::2::3") == null)
    assert(c(":::") == null)
    assert(c("12345::1") == null)
    assert(c("g::1") == null)
    assert(c("1:2:3:4:5:6:7:8:9") == null)
    assert(c("::1:2:3:4:5:6:7:8") == null) // :: must cover >= 1 group
  }
  test("embedded ipv4 tail") {
    assert(c("64:ff9b::1.2.3.4") == "64:ff9b::102:304")
    assert(c("::ffff:1.2.300.4") == null)
  }
}
