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
      val v4Ok = (Seq(randomProbe) ++ insideProbe).forall { probe =>
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
      // v6 probes too (round-5 test-review find: v4-only probing left the
      // v6 half of the index model-unchecked): one probe INSIDE a random
      // feed network (host bits below its prefix) and one fully random
      val v6Probes = {
        val inside = if (deduped.nonEmpty) {
          val (c, _) = deduped(rnd.nextInt(deduped.size))
          val (mh, ml) = Cidr.mask(c.hi, c.lo, c.prefixLen)
          val hostBig =
            if (c.prefixLen >= 128) BigInt(0)
            else BigInt(128 - c.prefixLen, new java.util.Random(seed))
          Some(toBig(mh, ml) | hostBig)
        } else None
        val rand = BigInt(128, new java.util.Random(seed ^ 0x5deece66dL))
        inside.toSeq :+ rand
      }
      val v6Ok = v6Probes.forall { big =>
        val groups = Array.tabulate(8)(g =>
          ((big >> ((7 - g) * 16)) & 0xffff).toInt)
        val probe = Ipv6Format.format(groups)
        val expected = modelLpm(entries, big)
        val actual = Option(idx.lookupV6(probe))
        (expected, actual) match {
          case (None, None) => true
          case (Some(e), Some((i, plen))) =>
            i == e.idx && plen == e.unifiedLen
          case _ => false
        }
      }
      v4Ok && v6Ok
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
        // v6 order-invariance probe from a feed network's base (round-5
        // test-review find: v4-only probes made v6-confined insert-order
        // bugs invisible — v6-only divergence agreed vacuously)
        val v6Probe = parsed.headOption.map { c =>
          val (mh, ml) = Cidr.mask(c.hi, c.lo, c.prefixLen)
          Ipv6Format.format(Array.tabulate(8)(g =>
            (((if (g < 4) mh >>> ((3 - g) * 16)
               else ml >>> ((7 - g) * 16)) & 0xffffL)).toInt))
        }
        val v6Ok = v6Probe.forall(pv =>
          Option(a.lookupV6(pv)) == Option(b.lookupV6(pv)))
        ra.map(_._1) == rb.map(_._1) && ra.map(_._2) == rb.map(_._2) && v6Ok
    })
  }
}
