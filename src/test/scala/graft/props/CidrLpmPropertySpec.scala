package graft.props

import graft.extract.Ipv6Format
import graft.intel.{Cidr, LpmIndex}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based LPM tests against a naive BigInt bit-string model
  * (SURVEY.md §5): Cidr.mask vs 128-bit shift arithmetic, and LpmIndex
  * lookups vs "check every CIDR, most-specific wins" — the semantics of the
  * reference trie (matchy-ip-trie/src/lib.rs:88-100, 233-252: longest
  * prefix wins regardless of insert order).
  */
class CidrLpmPropertySpec extends AnyFunSuite {

  private def checkProp(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  private def toBig(hi: Long, lo: Long): BigInt =
    (BigInt(hi & Long.MaxValue) | (BigInt(hi >>> 63) << 63)) << 64 |
      (BigInt(lo & Long.MaxValue) | (BigInt(lo >>> 63) << 63))

  test("Cidr.mask == BigInt 128-bit shift model") {
    checkProp("mask-model", Prop.forAllNoShrink(
      Gen.long, Gen.long, Gen.choose(0, 128)) { (hi, lo, len) =>
      val (mh, ml) = Cidr.mask(hi, lo, len)
      val v = toBig(hi, lo)
      val model =
        if (len == 0) BigInt(0)
        else (v >> (128 - len)) << (128 - len)
      toBig(mh, ml) == model
    })
  }

  // ------------------------------------------------------------- LPM model
  private case class Entry(big: BigInt, unifiedLen: Int, idx: Int)

  private def modelLpm(entries: Seq[Entry], probe: BigInt): Option[Entry] = {
    def masked(v: BigInt, len: Int): BigInt =
      if (len == 0) BigInt(0) else (v >> (128 - len)) << (128 - len)
    entries.filter(e => masked(probe, e.unifiedLen) == e.big)
      .sortBy(-_.unifiedLen).headOption
  }

  private val v4CidrGen: Gen[String] = for {
    a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
    c <- Gen.choose(0, 255); d <- Gen.choose(0, 255)
    p <- Gen.choose(4, 32)
  } yield s"$a.$b.$c.$d/$p"

  private val v6CidrGen: Gen[String] = for {
    gs <- Gen.listOfN(8, Gen.frequency(1 -> Gen.const(0),
      2 -> Gen.choose(0, 0xffff)))
    p <- Gen.choose(8, 128)
  } yield Ipv6Format.format(gs.toArray) + "/" + p

  private val feedGen: Gen[List[String]] = for {
    n4 <- Gen.choose(1, 12)
    n6 <- Gen.choose(0, 8)
    v4s <- Gen.listOfN(n4, v4CidrGen)
    v6s <- Gen.listOfN(n6, v6CidrGen)
  } yield v4s ++ v6s

  test("LpmIndex == naive most-specific-wins model (v4 + v6 mixed)") {
    val probeOctet = Gen.choose(0, 255)
    checkProp("lpm-model", Prop.forAllNoShrink(
      feedGen, Gen.listOfN(4, probeOctet), Gen.long) { (feed, po, seed) =>
      // parse + dedupe by (masked network, len): the hash index is
      // last-wins on exact duplicates, so keep only the last of each
      val parsed = feed.map(Cidr.parse).filter(_ != null)
      val deduped = parsed.zipWithIndex
        .groupBy { case (c, _) =>
          (Cidr.mask(c.hi, c.lo, c.prefixLen), c.prefixLen) }
        .map(_._2.last).toSeq.sortBy(_._2)
      val idx = LpmIndex.build(deduped.map { case (c, i) => (c, i) })
      val entries = deduped.map { case (c, i) =>
        val (mh, ml) = Cidr.mask(c.hi, c.lo, c.prefixLen)
        Entry(toBig(mh, ml), c.prefixLen, i)
      }
      // probes: one random v4, plus a host inside a random feed network
      val rnd = new scala.util.Random(seed)
      val randomProbe = po.mkString(".")
      val insideProbe = if (deduped.nonEmpty) {
        val (c, _) = deduped(rnd.nextInt(deduped.size))
        if (c.isV4) {
          val host = rnd.nextLong().abs & ((1L << (128 - c.prefixLen)) - 1)
          val v4 = ((c.lo & 0xffffffffL) & ~((1L << (128 - c.prefixLen)) - 1)) | host
          Some(s"${(v4 >> 24) & 0xff}.${(v4 >> 16) & 0xff}.${(v4 >> 8) & 0xff}.${v4 & 0xff}")
        } else None
      } else None
      (Seq(randomProbe) ++ insideProbe).forall { probe =>
        val v4 = Cidr.parseV4(probe)
        val (hi, lo) = Cidr.v4ToUnified(v4)
        val expected = modelLpm(entries, toBig(hi, lo))
        val actual = Option(idx.lookupV4(probe))
        (expected, actual) match {
          case (None, None) => true
          case (Some(e), Some((i, plen))) =>
            i == e.idx && plen == math.max(0, e.unifiedLen - 96)
          case _ => false
        }
      }
    })
  }

  test("LPM most-specific wins regardless of insert order (shuffled feeds)") {
    checkProp("lpm-order-invariant", Prop.forAllNoShrink(
      feedGen, Gen.long, Gen.listOfN(4, Gen.choose(0, 255))) {
      (feed, seed, po) =>
        val parsed = feed.map(Cidr.parse).filter(_ != null)
          .groupBy(c => (Cidr.mask(c.hi, c.lo, c.prefixLen), c.prefixLen))
          .map(_._2.head).toSeq
        val probe = po.mkString(".")
        val a = LpmIndex.build(parsed.zipWithIndex)
        val shuffled = new scala.util.Random(seed).shuffle(parsed.zipWithIndex)
        val b = LpmIndex.build(shuffled)
        val ra = Option(a.lookupV4(probe))
        val rb = Option(b.lookupV4(probe))
        ra.map(_._1) == rb.map(_._1) && ra.map(_._2) == rb.map(_._2)
    })
  }
}
