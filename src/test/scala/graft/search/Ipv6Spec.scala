package graft.search

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The IPv6 parse/order contracts behind the `ip_range`/`ip_prefix`
  * v6 arms:
  *   - the column parser ([[QueryDsl.ipv6GroupValsCol]]) agrees with
  *     java.net.InetAddress (an independent reference — literal v6
  *     parses never touch the resolver) on every valid form it serves;
  *   - dirt NULLs out (never throws — ANSI mode, 100-TB scans);
  *   - the driver bound parser is the strict twin (same grammar,
  *     fails loud instead of NULLing);
  *   - the biased (hi, lo) pair orders exactly like the unsigned
  *     128-bit address value.
  */
class Ipv6Spec extends SparkSpec {

  private def refGroups(s: String): Seq[Long] = {
    val b = java.net.InetAddress.getByName(s).getAddress
    assert(b.length === 16, s"$s is not v6")
    (0 until 8).map(i => ((b(2 * i) & 0xffL) << 8) | (b(2 * i + 1) & 0xffL))
  }

  private def parseAll(addrs: Seq[String]): Map[String, Option[Seq[Long]]] = {
    import spark.implicits._
    addrs.toDF("ip")
      .select(col("ip"), QueryDsl.ipv6GroupValsCol(col("ip")).as("g"))
      .collect()
      .map(r => r.getString(0) ->
        Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq))
      .toMap
  }

  test("column parser matches InetAddress on full and ::-compressed forms") {
    val valid = Seq(
      "::", "::1", "1::", "2001:db8::1", "2001:DB8::1",
      "fe80::a:b:c", "0:0:0:0:0:0:0:0", "1:2:3:4:5:6:7:8",
      "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",
      "2001:db8:0:0:8:800:200c:417a", "2001:db8::8:800:200c:417a",
      "ff01::101", "a:b:c:d::", "::a:b:c:d",
      // form 3 (dotted-quad suffix) where Java keeps a 16-byte
      // Inet6Address: v4-compatible and NAT64 forms
      "::1.2.3.4", "::0.0.0.0", "1:2:3:4:5:6:7.8.9.10",
      "64:ff9b::192.0.2.33", "64:ff9b::255.255.255.255")
    val got = parseAll(valid)
    valid.foreach { a =>
      assert(got(a) === Some(refGroups(a)), s"parse of '$a'")
      // driver bound parser is the strict twin
      assert(QueryDsl.ipv6Groups(a, "spec") === refGroups(a), s"driver '$a'")
    }
  }

  test("v4-mapped form 3 parses (Java flattens ::ffff:quad to Inet4Address," +
    " so the reference is the construction)") {
    // InetAddress.getByName collapses ::ffff:a.b.c.d to a 4-byte
    // Inet4Address, so refGroups can't serve here; the expected
    // groups come straight from RFC 4291 §2.5.5.2's layout.
    val cases = Seq(
      "::ffff:192.0.2.1" ->
        Seq(0L, 0L, 0L, 0L, 0L, 0xffffL, 0xc000L, 0x0201L),
      "::FFFF:255.255.255.255" ->
        Seq(0L, 0L, 0L, 0L, 0L, 0xffffL, 0xffffL, 0xffffL),
      "::ffff:0.0.0.0" -> Seq(0L, 0L, 0L, 0L, 0L, 0xffffL, 0L, 0L),
      "0:0:0:0:0:ffff:10.20.30.40" ->
        Seq(0L, 0L, 0L, 0L, 0L, 0xffffL, 0x0a14L, 0x1e28L))
    val got = parseAll(cases.map(_._1))
    cases.foreach { case (a, exp) =>
      assert(got(a) === Some(exp), s"parse of '$a'")
      assert(QueryDsl.ipv6Groups(a, "spec") === exp, s"driver '$a'")
    }
  }

  test("dirt NULLs out in the column parser and fails loud on the driver") {
    val dirty = Seq(
      "", ":", ":::", "a::b::c", "1:2:3", "1:2:3:4:5:6:7",
      "1:2:3:4:5:6:7:8:9", "1::2:3:4:5:6:7:8", "12345::", "g::1",
      ":1:2:3:4:5:6:7", "1:2:3:4:5:6:7:", "junk",
      "1.2.3.4", // no colon at all: a v4 literal is not a v6 address
      // form-3 dirt: bad quads and quads in the wrong place
      "::ffff:1.2.3.256", "::ffff:1.2.3", "::ffff:1.2.3.4.5",
      "::ffff:01.2.3.4", "::ffff:1.2.3.04", "::ffff:1.2.3.4:5",
      "::ffff:1.2.3.", "::ffff:1.2..4", "::ffff:-1.2.3.4",
      "::ffff:1.2.3.4e", "1.2.3.4::", "1:2:3:4:5:6:7:8.9.10.11")
    val got = parseAll(dirty)
    dirty.foreach(a => assert(got(a) === None, s"'$a' must NULL out"))
    dirty.foreach(a => intercept[IllegalArgumentException](
      QueryDsl.ipv6Groups(a, "spec")))
  }

  test("biased (hi, lo) pair orders exactly like the unsigned 128-bit value") {
    val rnd = new scala.util.Random(17)
    val addrs = Seq("::", "::1", "ffff::", "8000::", "7fff:ffff::",
      "::ffff:ffff:ffff:ffff", "8000:0:0:0:ffff::") ++
      (1 to 60).map(_ => (0 until 8).map(_ =>
        f"${rnd.nextInt(65536)}%x").mkString(":"))
    def bigValue(g: Seq[Long]): BigInt =
      g.foldLeft(BigInt(0))((acc, v) => (acc << 16) | BigInt(v))
    val pairs = addrs.map { a =>
      val g = QueryDsl.ipv6Groups(a, "spec")
      (QueryDsl.ipv6BiasedPair(g), bigValue(g))
    }
    val byPair = pairs.sortBy(_._1).map(_._2)
    val byValue = pairs.map(_._2).sorted
    assert(byPair === byValue)
  }

  test("ip_range/ip_prefix v6 request validation stays loud") {
    import spark.implicits._
    val t = Seq((1L, "::1")).toDF("id", "ip")
    def bad(json: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](QueryDsl.search(t, json))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    bad("""{"aggs": {"n": {"ip_range": {"field": "ip",
        "ranges": [{"from": "10.0.0.0", "to": "2001:db8::"}]}}}}""",
      "mixes IPv4 and IPv6 bounds")
    bad("""{"aggs": {"n": {"ip_range": {"field": "ip",
        "ranges": [{"to": "2001:db8::g"}]}}}}""",
      "not a full, ::-compressed, or v4-mapped IPv6 address")
    bad("""{"aggs": {"n": {"ip_prefix": {"field": "ip",
        "prefix_length": 129, "is_ipv6": true}}}}""",
      "prefix_length must be 1-128")
    bad("""{"aggs": {"n": {"ip_prefix": {"field": "ip",
        "prefix_length": 64}}}}""",
      "prefix_length must be 1-32")
    // the v4 arm still rejects v6-looking bounds with its own message
    bad("""{"aggs": {"n": {"ip_prefix": {"field": "ip",
        "prefix_length": 33, "is_ipv6": false}}}}""",
      "prefix_length must be 1-32")
  }

  test("ip_prefix v6 masks group-wise at non-multiple-of-16 lengths") {
    import spark.implicits._
    val t = Seq(
      (1L, "2001:db8:80ff::1"),  // g2 = 0x80ff
      (2L, "2001:db8:80aa::2"),  // same /20..../24 net as above
      (3L, "2001:db8:7fff::3")   // differs at bit 33
    ).toDF("id", "ip")
    val got = QueryDsl.search(t,
      """{"aggs": {"net": {"ip_prefix": {"field": "ip",
          "prefix_length": 33, "is_ipv6": true}}}}""")
      .select("net", "doc_count").as[(String, Long)].collect().toSeq
    // /33 keeps one bit of group 2: 0x80ff/0x80aa -> 0x8000, 0x7fff -> 0
    assert(got === Seq(
      ("2001:db8:0:0:0:0:0:0/33", 1L),
      ("2001:db8:8000:0:0:0:0:0/33", 2L)))
  }
}
