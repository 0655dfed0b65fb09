package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** UrlNormalize — canonical-form rules, one by one. */
class UrlNormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def norm(url: String): (String, String, Integer, Integer,
      Boolean) = {
    val r = UrlNormalize.normalize(Seq(Tuple1(url)).toDF("url"), "url")
      .select("url_norm", "host", "n_params_kept", "n_params_dropped",
        "malformed").collect()(0)
    (r.getString(0), r.getString(1),
      if (r.isNullAt(2)) null else Int.box(r.getInt(2)),
      if (r.isNullAt(3)) null else Int.box(r.getInt(3)),
      r.getBoolean(4))
  }

  test("scheme and host lowercase; path case preserved") {
    assert(norm("HTTP://Example.COM/Path/File")._1 ==
      "http://example.com/Path/File")
  }

  test("default ports stripped only for the matching scheme") {
    assert(norm("http://h.com:80/a")._1 == "http://h.com/a")
    assert(norm("https://h.com:443/a")._1 == "https://h.com/a")
    assert(norm("https://h.com:80/a")._1 == "https://h.com:80/a")
    assert(norm("http://h.com:8080/a")._1 == "http://h.com:8080/a")
    assert(norm("ftp://h.com:80/a")._1 == "ftp://h.com:80/a")
  }

  test("fragment dropped, including a fragment containing '?'") {
    assert(norm("http://h.com/a#frag")._1 == "http://h.com/a")
    assert(norm("http://h.com/a#frag?x=1")._1 == "http://h.com/a")
    assert(norm("http://h.com/a#frag?x=1")._3 == Int.box(0))
  }

  test("tracking params dropped, rest sorted, empties removed") {
    val (u, _, kept, dropped, _) =
      norm("http://h.com/a?z=9&utm_source=s&a=1&&fbclid=f&b=2")
    assert(u == "http://h.com/a?a=1&b=2&z=9")
    assert(kept == Int.box(3) && dropped == Int.box(2))
  }

  test("all params dropped leaves no '?'; empty path becomes '/'") {
    assert(norm("http://h.com?utm_campaign=x")._1 == "http://h.com/")
    assert(norm("http://h.com")._1 == "http://h.com/")
  }

  test("values are preserved byte-exact (only order is canonical)") {
    assert(norm("http://h.com/p?b=Hello%20World&a=UPPER")._1 ==
      "http://h.com/p?a=UPPER&b=Hello%20World")
  }

  test("malformed and NULL input: NULL outputs, flag set, no throw") {
    assert(norm("not a url") == (null, null, null, null, true))
    assert(norm("://missing.scheme/x")._5)
    assert(norm(null) == (null, null, null, null, true))
  }

  test("idempotence: normalizing a normal form is the identity") {
    for (u <- Seq("HTTP://A.COM:80/x?b=2&utm_x=1&a=1#f",
      "https://B.org:9000/deep/path?z=1", "http://c.net")) {
      val once = norm(u)._1
      assert(norm(once)._1 == once, u)
    }
  }
}
