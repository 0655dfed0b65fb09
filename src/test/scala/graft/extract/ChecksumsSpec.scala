package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class ChecksumsSpec extends AnyFunSuite {

  test("keccak256 of empty input matches the published Keccak vector") {
    // Legacy Keccak-256("") — public vector (keccak.team):
    val d = Checksums.keccak256(Array.emptyByteArray)
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    assert(hex == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
  }

  test("keccak256 of 'abc' matches the published Keccak vector") {
    val d = Checksums.keccak256("abc".getBytes("US-ASCII"))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    assert(hex == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
  }

  test("base58 round trip") {
    val payload = Array[Byte](0, 0, 1, 2, 3, 4, 5, -1, 127)
    val enc = Checksums.base58Encode(payload)
    assert(enc.startsWith("11"))
    assert(Checksums.base58Decode(enc).toSeq == payload.toSeq)
  }

  test("base58 decode rejects invalid chars") {
    assert(Checksums.base58Decode("0OIl") == null)
  }

  test("bitcoin base58check: genesis address valid") {
    assert(Checksums.validBase58Check("1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa"))
  }

  test("bitcoin base58check: P2SH valid") {
    assert(Checksums.validBase58Check("3J98t1WpEZ73CNmQviecrnyiWrnqRhWNLy"))
  }

  test("bitcoin base58check: corrupted checksum invalid") {
    assert(!Checksums.validBase58Check("1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNb"))
  }

  test("bitcoin bech32: BIP-173 vectors") {
    assert(Checksums.validBitcoinBech32(
      "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t4"))
    // uppercase variant is valid bech32
    assert(Checksums.validBitcoinBech32(
      "BC1QW508D6QEJXTDG4Y5R3ZARVARY0C5XW7KV8F3T4"))
    // mixed case is invalid
    assert(!Checksums.validBitcoinBech32(
      "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3T4"))
    // corrupted
    assert(!Checksums.validBitcoinBech32(
      "bc1qw508d6qejxtdg4y5r3zarvary0c5xw7kv8f3t5"))
    // wrong hrp (testnet)
    assert(!Checksums.validBitcoinBech32(
      "tb1qw508d6qejxtdg4y5r3zarvary0c5xw7kxpjzsx"))
  }

  test("ethereum: EIP-55 published vectors") {
    assert(Checksums.validEthereum("0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed"))
    assert(Checksums.validEthereum("0xfB6916095ca1df60bB79Ce92cE3Ea74c37c5d359"))
    assert(Checksums.validEthereum("0xdbF03B407c01E7cD3CBea99509d93f8DDDC8C6FB"))
    assert(Checksums.validEthereum("0xD1220A0cf47c7B9Be7A2E6BA89F429762e7b9aDb"))
  }

  test("ethereum: unicase accepted without checksum") {
    assert(Checksums.validEthereum("0xde709f2102306220921060314715629080e2fb77"))
    assert(Checksums.validEthereum("0x52908400098527886E0F7030069857D2E4169EE7"))
  }

  test("ethereum: broken EIP-55 mixed case rejected") {
    assert(!Checksums.validEthereum("0x5Aaeb6053F3E94C9b9A09f33669435E7Ef1BeAed"))
  }

  test("ethereum: bytes-form validator agrees with the String form on " +
    "every vector class (valid mixed, unicase, broken mixed, non-hex), " +
    "including at a nonzero buffer offset") {
    val cases = Seq(
      "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAed",
      "0xfB6916095ca1df60bB79Ce92cE3Ea74c37c5d359",
      "0xdbF03B407c01E7cD3CBea99509d93f8DDDC8C6FB",
      "0xD1220A0cf47c7B9Be7A2E6BA89F429762e7b9aDb",
      "0xde709f2102306220921060314715629080e2fb77",
      "0x52908400098527886E0F7030069857D2E4169EE7",
      "0x5Aaeb6053F3E94C9b9A09f33669435E7Ef1BeAed",
      "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAeg", // non-hex tail
      "0x5aAeb6053F3E94C9b9A09f33669435E7Ef1BeAeD") // flipped last case
    for (addr <- cases) {
      val direct = addr.getBytes("US-ASCII")
      assert(Checksums.validEthereumBytes(direct, 0) ==
        Checksums.validEthereum(addr), addr)
      val padded = ("??" + addr + "!").getBytes("US-ASCII")
      assert(Checksums.validEthereumBytes(padded, 2) ==
        Checksums.validEthereum(addr), s"offset form: $addr")
    }
  }

  test("monero: synthetic valid address (plain base58 + keccak checksum)") {
    // The reference validates with a plain whole-string base58 decode and a
    // legacy-Keccak 4-byte checksum (lib.rs:1895-1920) — build an address
    // that satisfies exactly that.
    val payload = new Array[Byte](65)
    payload(0) = 0x06 // chosen so the base58 form starts with 4 (monero-shaped)
    var i = 1
    while (i < 65) { payload(i) = ((i * 7 + 3) & 0x7f).toByte; i += 1 }
    val h = Checksums.keccak256(payload)
    val full = payload ++ h.take(4)
    var addr = Checksums.base58Encode(full)
    assert(Checksums.validMonero(addr))
    // corrupt one char
    val corrupted = addr.substring(0, addr.length - 1) +
      (if (addr.last == '2') '3' else '2')
    assert(!Checksums.validMonero(corrupted))
  }
}
