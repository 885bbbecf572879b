package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalize strips crawl noise and preserves meaning") {
    val Seq(a, b, c, d, e, f, g) = canon(
      "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&id=3&ref=z#frag",
      "http://example.com:80/",
      "https://sub.www.example.com/path",
      "https://example.com/p?utm_source=a&utm_campaign=b",
      "https://example.com:8443/x",
      "http://EXAMPLE.com:443/x",
      "https://example.com/Mixed/Case///")
    // scheme+host lowered, www./default port/fragment/tracking gone,
    // surviving params and path case intact, trailing slashes collapsed
    assert(a == "https://example.com/A/b?id=3")
    assert(b == "http://example.com")
    // only a LEADING www. is stripped — sub.www stays
    assert(c == "https://sub.www.example.com/path")
    // all params tracking → the '?' goes too
    assert(d == "https://example.com/p")
    // non-default port survives
    assert(e == "https://example.com:8443/x")
    // :443 is only default for https — kept under http
    assert(f == "http://example.com:443/x")
    assert(g == "https://example.com/Mixed/Case")
  }

  test("canonicalize is idempotent and total on messy input") {
    // a canonicalizer must be a projection: applying it twice cannot
    // change the key again, or incremental runs diverge from batch
    val messy = Seq(
      "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&id=3&ref=z#frag",
      "http://example.com:80/",
      "https://example.com/p?utm_source=a",
      "https://example.com:8443/x?a=1&b=2",
      "example.com/no-scheme#frag",   // scheme-less: fragment-strip only
      "//protocol.relative/x",
      "", "not a url at all",
      "https://example.com",
      "https://h.com/redirect?to=https://x.com/y&utm_source=z",
      "https://h.com/p?q=what??&id=1")
    val once = canon(messy: _*)
    val twice = once.map(u => canon(u).head)
    assert(once == twice, s"not idempotent:\n${once.zip(twice).filter(p => p._1 != p._2)}")
    assert(canon("example.com/no-scheme#frag") == Seq("example.com/no-scheme"))
    assert(canon("") == Seq(""))
    // an embedded :// (redirect target) must not truncate the URL
    assert(canon("https://h.com/redirect?to=https://x.com/y&utm_source=z") ==
      Seq("https://h.com/redirect?to=https://x.com/y"))
    // a second '?' belongs to the query, not a delimiter
    assert(canon("https://h.com/p?q=what??&id=1") ==
      Seq("https://h.com/p?q=what??&id=1"))
    // query with no path: the host still ends (and the port strips)
    assert(canon("https://Example.COM:443?id=1") ==
      Seq("https://example.com?id=1"))
  }

  test("property: canonicalize is total and idempotent over generated URL soup") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val urlGen = for {
      s <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp")
      h <- Gen.oneOf("Example.COM", "www.Example.com", "sub.www.x.org", "a-b.c")
      po <- Gen.oneOf("", ":80", ":443", ":8080")
      pa <- Gen.oneOf("", "/", "/A/b", "/A/b/", "/p//", "/Mixed/Case///")
      q <- Gen.oneOf("", "?utm_source=x", "?id=3&ref=z",
        "?a=1&utm_campaign=b&b=2", "?q=a??&to=https://x/y", "?")
      fr <- Gen.oneOf("", "#f", "#a#b")
    } yield s"$s://$h$po$pa$q$fr"
    val junk = Gen.oneOf("", "not a url", "example.com/x#f", "//rel/x",
      ":::", "a b c", "http:/half", "://nohost")
    val gen = Gen.listOfN(300, Gen.frequency(4 -> urlGen, 1 -> junk))
    val urls = gen.apply(Gen.Parameters.default, Seed(42L)).get
    import spark.implicits._
    val rows = urls.toDF("url")
      .select(col("url"), UrlOps.canonicalize(col("url")).as("c1"),
        UrlOps.canonicalizeSpec(col("url")).as("cs"))
      .select(col("url"), col("c1"), col("cs"),
        UrlOps.canonicalize(col("c1")).as("c2"))
      .collect()
    assert(rows.length == 300)
    rows.foreach { r =>
      val (url, c1, cs, c2) =
        (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
      assert(c1 != null, s"canonicalize returned null for <$url>")
      // the native kernel IS the regex/split/HOF composition, byte for
      // byte — the composition stays in the tree as the executable spec
      assert(c1 == cs, s"kernel != composition: <$url> -> <$c1> vs <$cs>")
      assert(c1 == c2, s"not idempotent: <$url> -> <$c1> -> <$c2>")
      if (url.matches("(?i)^https?://.*"))
        assert(c1.matches("^https?://.*"), s"scheme not lowered: <$url> -> <$c1>")
    }
  }

  test("dedupByUrl groups crawl variants under one keeper") {
    val df = Seq(
      (1L, "https://example.com/a?utm_source=x"),
      (2L, "HTTPS://WWW.example.com:443/a/"),
      (3L, "https://example.com/a?page=2"),
      (4L, "https://other.com/a")).toDF("id", "url")
    val out = UrlOps.dedupByUrl(df, "id", "url")
      .orderBy(col("canonical_url"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("https://example.com/a", 1L, 2L),
      ("https://example.com/a?page=2", 3L, 1L),
      ("https://other.com/a", 4L, 1L)))
  }

  test("dedup_url query: keepers are unique, counts cover the corpus") {
    val out = graft.SparkEntry.queries("dedup_url")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val keepers = out.map(_.getLong(1))
    assert(keepers.distinct.length == keepers.length)
    val total = graft.SparkEntry.queries("dedup_url")(spark, "/root/testdata/sf0.001")
      .agg(sum(col("n_dups"))).head.getLong(0)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(total == docs)
  }

  test("sample_epoch_order interleaves sources rank-by-rank, deterministically") {
    val run1 = graft.SparkEntry.queries("sample_epoch_order")(
      spark, "/root/testdata/sf0.001").collect()
    val run2 = graft.SparkEntry.queries("sample_epoch_order")(
      spark, "/root/testdata/sf0.001").collect()
    assert(run1.toSeq == run2.toSeq) // hash-keyed: bit-stable across runs
    assert(run1.nonEmpty)
    val nSources = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("source").distinct().count().toInt
    // epoch order is rank-major: the first |sources| rows are exactly
    // one rank-1 row per source — no source clumps at the front
    val head = run1.take(nSources)
    assert(head.forall(_.getInt(2) == 1))
    assert(head.map(_.getString(1)).distinct.length == nSources)
  }
}
