package graft.dialect

import org.apache.spark.unsafe.types.UTF8String

/** Static helpers behind the Trino IP address dialect functions
  * (StaticInvoke targets, like [[StatFuncs]]/[[BinFuncs]]).
  *
  * Trino models addresses as the IPADDRESS/IPPREFIX types
  * (docs/functions/ipaddress); this engine carries them as canonical
  * strings — dotted-quad IPv4 and RFC 5952-compressed IPv6 — which is
  * also how they land in parquet log data. Parsing accepts only
  * literal address syntax: a hostname never reaches
  * `InetAddress.getByName` (no DNS from an expression), enforced by a
  * character-set check before the JDK parser runs.
  *
  * All functions raise IllegalArgumentException on malformed input or
  * cross-family (v4 vs v6) arguments, mirroring Trino's
  * INVALID_FUNCTION_ARGUMENT (NULL under `try()`).
  */
object IpFuncs {

  /** Parse a literal IP address into raw bytes (4 or 16). */
  private[dialect] def parseAddr(s: String): Array[Byte] = {
    val t = s.trim
    // Literal-syntax gate: IPv6 must contain ':'; IPv4 only digits and
    // dots. Anything else (a hostname, an empty string) is rejected
    // BEFORE the JDK parser, which would otherwise resolve it via DNS.
    val isV6ish = t.contains(':') && t.forall(c =>
      c == ':' || c == '.' || c.isDigit ||
        (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))
    val isV4ish = t.nonEmpty && t.forall(c => c == '.' || c.isDigit)
    require(isV6ish || isV4ish, s"invalid IP address: '$s'")
    if (isV4ish) {
      val parts = t.split("\\.", -1)
      require(parts.length == 4, s"invalid IP address: '$s'")
      val out = new Array[Byte](4)
      var i = 0
      while (i < 4) {
        val p = parts(i)
        require(p.nonEmpty && p.length <= 3 && p.forall(_.isDigit) &&
          (p.length == 1 || p.charAt(0) != '0'),
          s"invalid IP address: '$s'")
        val v = p.toInt
        require(v <= 255, s"invalid IP address: '$s'")
        out(i) = v.toByte
        i += 1
      }
      out
    } else {
      try java.net.InetAddress.getByName(t).getAddress
      catch { case _: java.net.UnknownHostException =>
        throw new IllegalArgumentException(s"invalid IP address: '$s'")
      }
    }
  }

  /** Parse 'addr/bits'; returns (bytes, bits). */
  private[dialect] def parsePrefix(s: String): (Array[Byte], Int) = {
    val t = s.trim
    val slash = t.lastIndexOf('/')
    require(slash > 0 && slash < t.length - 1, s"invalid IP prefix: '$s'")
    val bitsStr = t.substring(slash + 1)
    require(bitsStr.forall(_.isDigit), s"invalid IP prefix: '$s'")
    val addr = parseAddr(t.substring(0, slash))
    val bits = bitsStr.toInt
    require(bits <= addr.length * 8,
      s"prefix length $bits exceeds address size: '$s'")
    (addr, bits)
  }

  /** Zero the host part (keep the first `bits` bits). */
  private def maskLow(addr: Array[Byte], bits: Int): Array[Byte] = {
    val out = addr.clone()
    var i = bits
    while (i < out.length * 8) {
      out(i / 8) = (out(i / 8) & ~(0x80 >> (i % 8))).toByte
      i += 1
    }
    out
  }

  /** Set the host part to all-ones. */
  private def fillHigh(addr: Array[Byte], bits: Int): Array[Byte] = {
    val out = addr.clone()
    var i = bits
    while (i < out.length * 8) {
      out(i / 8) = (out(i / 8) | (0x80 >> (i % 8))).toByte
      i += 1
    }
    out
  }

  private def sameNetwork(a: Array[Byte], b: Array[Byte], bits: Int): Boolean = {
    var i = 0
    var ok = true
    while (ok && i < bits) {
      ok = ((a(i / 8) >> (7 - i % 8)) & 1) == ((b(i / 8) >> (7 - i % 8)) & 1)
      i += 1
    }
    ok
  }

  /** Canonical rendering: dotted quad, or RFC 5952 IPv6 (lowercase,
    * longest ≥2-group zero run compressed, leftmost on tie). */
  private[dialect] def formatAddr(addr: Array[Byte]): String =
    if (addr.length == 4) addr.map(b => (b & 0xff).toString).mkString(".")
    else {
      val groups = new Array[Int](8)
      var i = 0
      while (i < 8) {
        groups(i) = ((addr(2 * i) & 0xff) << 8) | (addr(2 * i + 1) & 0xff)
        i += 1
      }
      // longest run of zero groups (length >= 2), leftmost wins ties
      var bestStart = -1
      var bestLen = 0
      var runStart = -1
      i = 0
      while (i <= 8) {
        if (i < 8 && groups(i) == 0) { if (runStart < 0) runStart = i }
        else {
          if (runStart >= 0) {
            val len = i - runStart
            if (len > bestLen) { bestLen = len; bestStart = runStart }
            runStart = -1
          }
        }
        i += 1
      }
      if (bestLen < 2) bestStart = -1
      val sb = new StringBuilder
      i = 0
      while (i < 8) {
        if (i == bestStart) {
          sb.append(if (i == 0) "::" else ":")
          i += bestLen
        } else {
          sb.append(java.lang.Integer.toHexString(groups(i)))
          if (i < 7 && i + 1 != bestStart) sb.append(':')
          i += 1
        }
      }
      if (bestStart >= 0 && bestStart + bestLen == 8 && bestStart != 0)
        sb.append(':')
      sb.toString
    }

  // ---- the dialect functions -------------------------------------------

  /** ip_prefix(ip, bits) → 'network/bits' with the host part zeroed. */
  def ipPrefix(ip: UTF8String, bits: Int): UTF8String = {
    val addr = parseAddr(ip.toString)
    require(bits >= 0 && bits <= addr.length * 8,
      s"prefix length $bits must be in [0, ${addr.length * 8}]")
    UTF8String.fromString(formatAddr(maskLow(addr, bits)) + "/" + bits)
  }

  def ipSubnetMin(cidr: UTF8String): UTF8String = {
    val (addr, bits) = parsePrefix(cidr.toString)
    UTF8String.fromString(formatAddr(maskLow(addr, bits)))
  }

  def ipSubnetMax(cidr: UTF8String): UTF8String = {
    val (addr, bits) = parsePrefix(cidr.toString)
    UTF8String.fromString(formatAddr(fillHigh(addr, bits)))
  }

  def ipSubnetRange(cidr: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val (addr, bits) = parsePrefix(cidr.toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](
      UTF8String.fromString(formatAddr(maskLow(addr, bits))),
      UTF8String.fromString(formatAddr(fillHigh(addr, bits)))))
  }

  /** is_subnet_of(prefix, x): x an address → membership; x a prefix →
    * containment (x's network is at least as specific and shares the
    * first `bits` bits). Cross-family args raise, like Trino. */
  def isSubnetOf(cidr: UTF8String, x: UTF8String): Boolean = {
    val (net, bits) = parsePrefix(cidr.toString)
    val xs = x.toString
    if (xs.contains('/')) {
      val (net2, bits2) = parsePrefix(xs)
      require(net.length == net2.length,
        "both IP version should be the same")
      bits2 >= bits && sameNetwork(net, net2, bits)
    } else {
      val addr = parseAddr(xs)
      require(net.length == addr.length,
        "both IP version should be the same")
      sameNetwork(net, addr, bits)
    }
  }

  /** The IANA special-purpose ranges behind Trino's is_private:
    * private-use, loopback, link-local, documentation, benchmarking,
    * CGN, reserved — "not globally reachable". */
  private val privateRanges: Array[(Array[Byte], Int)] = Array(
    "0.0.0.0/8", "10.0.0.0/8", "100.64.0.0/10", "127.0.0.0/8",
    "169.254.0.0/16", "172.16.0.0/12", "192.0.0.0/24", "192.0.2.0/24",
    "192.88.99.0/24", "192.168.0.0/16", "198.18.0.0/15",
    "198.51.100.0/24", "203.0.113.0/24", "240.0.0.0/4",
    "255.255.255.255/32",
    // (::ffff:0:0/96 is absent: the JDK parser canonicalizes
    // IPv4-mapped addresses to 4-byte form, so they take the v4 rules)
    "::/127", "64:ff9b:1::/48", "100::/64",
    "2001::/23", "2001:db8::/32", "2002::/16", "fc00::/7", "fe80::/10"
  ).map(s => parsePrefix(s))

  def isPrivate(ip: UTF8String): Boolean = {
    val addr = parseAddr(ip.toString)
    privateRanges.exists { case (net, bits) =>
      net.length == addr.length && sameNetwork(net, addr, bits)
    }
  }
}
