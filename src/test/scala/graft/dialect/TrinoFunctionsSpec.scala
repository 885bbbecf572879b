package graft.dialect

import graft.SparkSpec
import graft.config.EngineConfig
import graft.engine.Engine
import graft.service.QueryService

/** Each dialect shim callable through execute_query SQL text — the
  * exact surface a reference user types (SURVEY.md §4 custom piece 1). */
class TrinoFunctionsSpec extends SparkSpec {

  private lazy val qs = {
    val cfg = EngineConfig.fromEnv(Map.empty).toOption.get
    new QueryService(new Engine(cfg, Some("/root/testdata/sf0.001"), Some(spark)))
  }

  private def one(sql: String): Any =
    qs.execute(sql).fold(err => throw new AssertionError(s"$sql -> $err"), _.rows.head.head)

  test("approx_distinct over lineitem is within 5% of exact") {
    val approx = one("SELECT approx_distinct(l_partkey) FROM lineitem").asInstanceOf[Long]
    val exact = one("SELECT COUNT(DISTINCT l_partkey) FROM lineitem").asInstanceOf[Long]
    assert(math.abs(approx - exact).toDouble / exact <= 0.05)
  }

  test("approx_distinct accepts the max-standard-error arg") {
    assert(one("SELECT approx_distinct(o_custkey, 0.01) FROM orders").asInstanceOf[Long] > 0)
  }

  test("strpos is 1-based and 0 when absent") {
    assert(one("SELECT strpos('hello world', 'world')") == 7)
    assert(one("SELECT strpos('hello', 'xyz')") == 0)
  }

  test("date_diff('day', from, to) = to - from") {
    assert(one("SELECT date_diff('day', TIMESTAMP '1995-01-01 00:00:00', TIMESTAMP '1995-01-11 00:00:00')") == 10L)
    assert(one("SELECT date_diff('hour', TIMESTAMP '1995-01-01 00:00:00', TIMESTAMP '1995-01-01 06:00:00')") == 6L)
  }

  test("date_add('unit', n, ts) adds n units") {
    assert(one("SELECT CAST(date_add('day', 3, TIMESTAMP '1995-01-01 00:00:00') AS STRING)")
      == "1995-01-04 00:00:00")
  }

  test("json_extract_scalar pulls scalars via JSONPath") {
    assert(one("""SELECT json_extract_scalar('{"a": {"b": "deep"}}', '$.a.b')""") == "deep")
  }

  test("cardinality works on arrays (Spark built-in retained)") {
    assert(one("SELECT cardinality(array(1,2,3))") == 3)
  }

  test("contains is Trino array containment") {
    assert(one("SELECT contains(array(1,2,3), 2)") == true)
    assert(one("SELECT contains(array(1,2,3), 9)") == false)
  }

  test("try returns NULL on runtime error") {
    assert(one("SELECT try(CAST('abc' AS INT))") == null)
    assert(one("SELECT try(1+1)") == 2)
  }

  test("codepoint returns the code point") {
    assert(one("SELECT codepoint('A')") == 65)
  }

  test("to_unixtime returns DOUBLE seconds; from_unixtime returns TIMESTAMP") {
    assert(one("SELECT to_unixtime(TIMESTAMP '1970-01-01 00:01:00')") == 60.0)
    assert(one("SELECT CAST(from_unixtime(60) AS STRING)") == "1970-01-01 00:01:00")
  }

  test("to_unixtime preserves fractional seconds (Trino DOUBLE semantics)") {
    assert(one("SELECT to_unixtime(TIMESTAMP '1970-01-01 00:01:00.250')") == 60.25)
  }

  test("round-trip: from_unixtime(to_unixtime(ts)) = ts") {
    assert(one("SELECT from_unixtime(to_unixtime(TIMESTAMP '1995-06-17 12:30:00')) = TIMESTAMP '1995-06-17 12:30:00'") == true)
    assert(one("SELECT from_unixtime(to_unixtime(TIMESTAMP '1995-06-17 12:30:00.5')) = TIMESTAMP '1995-06-17 12:30:00.5'") == true)
  }

  test("any_match / all_match / none_match lambda predicates") {
    assert(one("SELECT any_match(array(1, 2, 3), x -> x > 2)") == true)
    assert(one("SELECT any_match(array(1, 2, 3), x -> x > 5)") == false)
    assert(one("SELECT all_match(array(1, 2, 3), x -> x > 0)") == true)
    assert(one("SELECT all_match(array(1, 2, 3), x -> x > 1)") == false)
    assert(one("SELECT none_match(array(1, 2, 3), x -> x > 5)") == true)
    assert(one("SELECT none_match(array(1, 2, 3), x -> x > 2)") == false)
  }

  test("format_datetime uses Joda-compatible letter patterns") {
    assert(one("SELECT format_datetime(TIMESTAMP '2001-08-22 03:04:05', 'yyyy-MM-dd HH:mm:ss')")
      == "2001-08-22 03:04:05")
  }

  test("format_datetime translates Joda Y and rejects week-based tokens") {
    // 2025-12-29 is in ISO week 1 of weekyear 2026: Joda 'Y' means the
    // calendar year 2025 — the JVM letter passed through would be the
    // week-based year (and Spark forbids it outright).
    assert(one("SELECT format_datetime(TIMESTAMP '2025-12-29 00:00:00', 'Y-MM-dd')")
      == "2025-12-29")
    // letters inside quoted literals are NOT pattern tokens
    assert(one("SELECT format_datetime(TIMESTAMP '2001-08-22 03:04:05', '''Year'' yyyy')")
      == "Year 2001")
    // tokens with no Spark equivalent fail with a clear message
    Seq("x", "w", "e", "C").foreach { tok =>
      val e = intercept[Throwable](
        one(s"SELECT format_datetime(TIMESTAMP '2001-08-22 03:04:05', '$tok')"))
      def msg(t: Throwable): String =
        Option(t.getMessage).getOrElse("") +
          Option(t.getCause).map(c => Option(c.getMessage).getOrElse("")).getOrElse("")
      assert(msg(e).contains("no Spark equivalent"), s"token $tok: ${msg(e)}")
    }
  }

  test("date_format translates MySQL %-tokens like Trino") {
    assert(one("SELECT date_format(TIMESTAMP '2001-08-22 03:04:05', '%Y-%m-%d %H:%i:%s')")
      == "2001-08-22 03:04:05")
    assert(one("SELECT date_format(TIMESTAMP '2001-08-22 03:04:05', '%d at %T')")
      == "22 at 03:04:05")
    // Spark letter patterns still pass through the same name
    assert(one("SELECT date_format(TIMESTAMP '2001-08-22 03:04:05', 'yyyy/MM')")
      == "2001/08")
    // %% escapes to a literal percent; unknown %x falls back to the char
    assert(one("SELECT date_format(TIMESTAMP '2001-08-22 03:04:05', '%Y is 100%% done')")
      == "2001 is 100% done")
  }

  test("date_parse inverts date_format via the same %-token translation") {
    assert(one("SELECT date_parse('2001-08-22 03:04:05', '%Y-%m-%d %H:%i:%s')")
      .toString == "2001-08-22 03:04:05.0")
    assert(one("SELECT date_parse('22/08/2001', '%d/%m/%Y')")
      .toString == "2001-08-22 00:00:00.0")
    // round trip
    assert(one("SELECT date_format(date_parse('2001-08-22', '%Y-%m-%d'), '%Y-%m-%d')")
      == "2001-08-22")
  }

  test("date_parse: %-less literal is MySQL literal text; computed format rejected") {
    // MySQL rules: letters outside %-tokens are literal characters, so a
    // format with no tokens parses only its own text (and yields the
    // epoch defaults) — it must NOT be handed to Spark as a Java pattern.
    assert(one("SELECT date_parse('T2001', 'T%Y')").toString == "2001-01-01 00:00:00.0")
    assert(one("SELECT date_parse('abc', 'abc')").toString == "1970-01-01 00:00:00.0")
    // a non-literal format expression has no sound translation — reject
    // loudly instead of silently parsing with Java-pattern semantics
    val err = qs.execute(
      "SELECT date_parse('2001', substr(l_returnflag, 1, 1)) FROM lineitem LIMIT 1")
    assert(err.isLeft, err)
    assert(err.left.exists(_.contains("literal format")), err)
  }

  test("ISO-8601 bridge: from_iso8601_timestamp/date and to_iso8601") {
    assert(one("SELECT from_iso8601_timestamp('2001-08-22T03:04:05')")
      .toString == "2001-08-22 03:04:05.0")
    assert(one("SELECT from_iso8601_timestamp('2001-08-22 03:04:05')")
      .toString == "2001-08-22 03:04:05.0")
    assert(one("SELECT from_iso8601_date('2001-08-22')").toString == "2001-08-22")
    assert(one("SELECT to_iso8601(TIMESTAMP '2001-08-22 03:04:05.120')")
      == "2001-08-22T03:04:05.120")
    assert(one("SELECT to_iso8601(DATE '2001-08-22')") == "2001-08-22")
  }

  test("ISO date-part functions match Trino numbering") {
    // 2001-08-22 was a Wednesday: ISO dow = 3 (Spark's dayofweek says 4)
    assert(one("SELECT day_of_week(DATE '2001-08-22')") == 3)
    assert(one("SELECT dow(DATE '2001-08-26')") == 7)       // Sunday
    assert(one("SELECT day_of_year(DATE '2001-02-01')") == 32)
    assert(one("SELECT doy(DATE '2001-01-01')") == 1)
    assert(one("SELECT week(DATE '2001-01-04')") == 1)
    assert(one("SELECT week_of_year(DATE '2001-12-31')") == 1) // ISO: wk 1 of 2002
    assert(one("SELECT year_of_week(DATE '2001-12-31')") == 2002)
    assert(one("SELECT yow(DATE '2005-01-02')") == 2004)
    assert(one("SELECT CAST(last_day_of_month(DATE '2001-02-03') AS STRING)")
      == "2001-02-28")
  }

  test("arbitrary / levenshtein_distance / to_base / from_base / nan family") {
    assert(one("SELECT arbitrary(r_name) FROM region WHERE r_name = 'AFRICA'")
      == "AFRICA")
    assert(one("SELECT levenshtein_distance('kitten', 'sitting')") == 3)
    assert(one("SELECT to_base(255, 16)") == "ff")
    assert(one("SELECT from_base('ff', 16)") == 255L)
    assert(one("SELECT is_nan(nan())") == true)
    assert(one("SELECT infinity() > 1e308") == true)
  }

  test("aggregate shims: map_agg / bitwise aggs / geometric_mean") {
    assert(one("SELECT map_agg(r_regionkey, r_name)['2'] FROM " +
      "(SELECT CAST(r_regionkey AS STRING) AS r_regionkey, r_name FROM region)")
      == "ASIA")
    assert(one("SELECT bitwise_and_agg(x) FROM (VALUES (7), (3), (11)) AS t(x)") == 3)
    assert(one("SELECT bitwise_or_agg(x) FROM (VALUES (1), (2), (4)) AS t(x)") == 7)
    val gm = one("SELECT geometric_mean(x) FROM (VALUES (2.0), (8.0)) AS t(x)")
      .asInstanceOf[Double]
    assert(math.abs(gm - 4.0) < 1e-9)
  }

  test("url_extract family maps to parse_url parts") {
    val u = "'https://example.com:8443/docs/page?lang=en&x=1#frag'"
    assert(one(s"SELECT url_extract_protocol($u)") == "https")
    assert(one(s"SELECT url_extract_host($u)") == "example.com")
    assert(one(s"SELECT url_extract_path($u)") == "/docs/page")
    assert(one(s"SELECT url_extract_query($u)") == "lang=en&x=1")
    assert(one(s"SELECT url_extract_fragment($u)") == "frag")
    assert(one(s"SELECT url_extract_port($u)") == 8443L)
    assert(one("SELECT url_extract_port('https://example.com/x')") == null)
    assert(one(s"SELECT url_extract_parameter($u, 'lang')") == "en")
    // url_encode / url_decode are name-identical Spark natives
    assert(one("SELECT url_encode('a b&c')") == "a+b%26c")
    assert(one("SELECT url_decode('a+b%26c')") == "a b&c")
  }

  test("split_part / regexp_count / arrays_overlap are name-compatible natives") {
    assert(one("SELECT split_part('a,b,c', ',', 2)") == "b")
    assert(one("SELECT regexp_count('1a 2b 14m', '\\d+')") == 3)
    assert(one("SELECT arrays_overlap(array(1,2), array(2,3))") == true)
  }

  test("preprocess leaves date_add patterns inside string literals alone") {
    val sql = "SELECT 'date_add(''day'', 1, x)' AS s"
    assert(TrinoFunctions.preprocess(sql) == sql)
    assert(qs.execute(sql).toOption.get.rows.head.head == "date_add('day', 1, x)")
  }

  test("preprocess rewrites only known units") {
    assert(TrinoFunctions.preprocess("SELECT date_add('banana', 1, ts)") ==
      "SELECT date_add('banana', 1, ts)")
    assert(TrinoFunctions.preprocess("SELECT date_add('week', 1, ts)") ==
      "SELECT date_add(week, 1, ts)")
  }

  test("TABLESAMPLE BERNOULLI/SYSTEM rewrite to Spark PERCENT sampling") {
    assert(TrinoFunctions.preprocess(
      "SELECT * FROM lineitem TABLESAMPLE BERNOULLI(10)") ==
      "SELECT * FROM lineitem TABLESAMPLE (10 PERCENT)")
    assert(TrinoFunctions.preprocess(
      "SELECT * FROM t TABLESAMPLE system(2.5)") ==
      "SELECT * FROM t TABLESAMPLE (2.5 PERCENT)")
    // masked inside literals
    val lit = "SELECT 'TABLESAMPLE BERNOULLI(10)' AS s"
    assert(TrinoFunctions.preprocess(lit) == lit)
    // end-to-end through the guarded route: a sample is a subset
    val r = qs.execute(
      "SELECT COUNT(*) AS n FROM (SELECT * FROM lineitem TABLESAMPLE BERNOULLI(50))")
      .toOption.get
    val total = qs.execute("SELECT COUNT(*) AS n FROM lineitem")
      .toOption.get.rows.head.head.toString.toLong
    val n = r.rows.head.head.toString.toLong
    assert(n > 0 && n < total)
  }

  test("native extension functions callable from SQL") {
    assert(one("SELECT size(minhash_sig(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT)), 16))") == 16)
    // xxhash64 carries Trino semantics (8-byte VARBINARY) on this
    // surface — bridge back to BIGINT for the graft-native simhash64
    assert(one("SELECT simhash64(array(from_big_endian_64(xxhash64('a')), " +
      "from_big_endian_64(xxhash64('b'))))").isInstanceOf[Long])
    assert(one("SELECT sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L))") == 2)
    assert(one("SELECT dotf(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))") == 11.0)
    assert(one("SELECT size(shingle_hash(array('a','b','c','d'), 3))") == 2)
  }

  test("native extensions reject or cast mismatched SQL input types") {
    // array(1.0, 2.0) is array<double>: must be implicitly cast to
    // array<float>, never misread via 4-of-8-byte getFloat
    assert(one("SELECT dotf(array(1.0D, 2.0D), array(3.0D, 4.0D))") == 11.0)
    assert(one("SELECT srp_sig(array(1.0D, -2.0D), 16)").isInstanceOf[Long])
    // an un-castable input fails analysis instead of corrupting
    assert(qs.execute("SELECT dotf('not an array', array(1.0D))").isLeft)
    assert(qs.execute("SELECT simhash64(array(struct(1), struct(2)))").isLeft)
  }

  test("cosine_similarity over dense float arrays") {
    val c = one("SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").asInstanceOf[Double]
    assert(math.abs(c - 1.0) < 1e-12)
    val o = one("SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)))").asInstanceOf[Double]
    assert(math.abs(o) < 1e-12)
    // real embeddings through the full SQL path
    assert(one("SELECT cosine_similarity(a.embedding, a.embedding) FROM embeddings a WHERE a.vec_id = 0")
      .asInstanceOf[Double] > 0.999999)
  }

  test("near-dup SQL sketch: shingle+minhash over documents via execute_query") {
    val r = qs.execute(
      """SELECT doc_id, minhash_sig(shingle_hash(split(lower(text), '\\s+'), 3), 32) AS sig
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin)
    assert(r.isRight, r)
    assert(r.toOption.get.rows.length == 5)
  }

  test("shims compose with the guard (still read-only surface)") {
    assert(qs.execute("SELECT strpos(o_orderpriority, 'URGENT') FROM orders LIMIT 1").isRight)
    assert(qs.execute("CREATE TABLE x AS SELECT strpos('a','a')").isLeft)
  }

  test("qdigest surface: qdigest_agg / merge / value_at_quantile end to end") {
    // qdigest_agg itself runs through the guarded surface…
    assert(qs.execute(
      """SELECT l_returnflag, length(qdigest_agg(l_extendedprice)) AS sk_bytes
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      .toOption.exists(_.rows.length == 3))
    // …while the merge(...) step runs at the library level: the
    // read-only classifier flags the MERGE keyword (the reference's
    // guard pins the same word list — a Trino user hits the identical
    // false positive through its MCP server).
    graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .createOrReplaceTempView("li_qdigest_test")
    val p50 = spark.sql(
      """SELECT value_at_quantile(merge(sk), 0.5)
        |FROM (SELECT qdigest_agg(l_extendedprice) AS sk
        |      FROM li_qdigest_test GROUP BY l_returnflag) t""".stripMargin)
      .collect().head.getDouble(0)
    // KLL rank error ~2%: assert via the exact CDF around the estimate
    val below = one(
      s"SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= $p50")
      .asInstanceOf[Long]
    val total = one("SELECT COUNT(*) FROM lineitem").asInstanceOf[Long]
    assert(math.abs(below.toDouble / total - 0.5) <= 0.05,
      s"merged p50 $p50 at rank ${below.toDouble / total}")
  }

  test("sketch aggs implicitly cast narrow inputs (INTEGER column, not just BIGINT)") {
    // regression: without declared input types an INTEGER column threw
    // ClassCastException inside the aggregate's update
    assert(one(
      "SELECT intersection_cardinality(make_set_digest(n_nationkey), " +
        "make_set_digest(n_regionkey)) FROM nation").asInstanceOf[Long] == 5L)
    assert(one(
      "SELECT value_at_quantile(qdigest_agg(n_nationkey), 0.5) FROM nation")
      .asInstanceOf[Double] == 12.0)
  }

  test("setdigest surface: make_set_digest / merge_set_digest / intersection_cardinality") {
    val both = one(
      """SELECT intersection_cardinality(
        |  (SELECT merge_set_digest(sk) FROM
        |    (SELECT make_set_digest(l_partkey) AS sk FROM lineitem
        |     WHERE l_returnflag = 'A' GROUP BY l_linestatus) a),
        |  (SELECT make_set_digest(l_partkey) FROM lineitem WHERE l_returnflag = 'R'))
        |""".stripMargin).asInstanceOf[Long]
    val exact = one(
      """SELECT COUNT(*) FROM (
        |  SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |  INTERSECT
        |  SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R') t""".stripMargin)
      .asInstanceOf[Long]
    assert(exact > 0)
    assert(math.abs(both - exact).toDouble / exact <= 0.05, s"$both vs $exact")
  }

  test("hash_counts returns the set_digest's per-hash counts") {
    // 3 distinct values, one seen twice: 3 entries whose counts
    // multiset is {2, 1, 1} (keys are 64-bit element hashes)
    assert(one("SELECT cardinality(hash_counts(make_set_digest(x))) " +
      "FROM (VALUES 1, 1, 2, 3) AS t(x)") == 3)
    val counts = one(
      "SELECT array_sort(map_values(hash_counts(make_set_digest(x)))) " +
        "FROM (VALUES 1, 1, 2, 3) AS t(x)")
      .asInstanceOf[scala.collection.Seq[Any]]
    assert(counts.map(_.toString) == Seq("1", "1", "2"), counts)
    // merge accumulates counts across digests (1 appears in both)
    val merged = one(
      """SELECT array_sort(map_values(hash_counts(merge_set_digest(sk))))
        |FROM (
        |  SELECT make_set_digest(x) AS sk FROM (VALUES 1, 2) AS t(x)
        |  UNION ALL
        |  SELECT make_set_digest(x) FROM (VALUES 1, 3) AS t(x)
        |) u""".stripMargin).asInstanceOf[scala.collection.Seq[Any]]
    assert(merged.map(_.toString) == Seq("1", "1", "2"), merged)
    // identical inputs -> identical key sets in identical (unsigned
    // ascending) order — determinism across plans (maps don't take `=`
    // in Spark; keys as arrays do)
    assert(one(
      "SELECT map_keys(hash_counts(make_set_digest(n_nationkey))) = " +
        "map_keys(hash_counts(make_set_digest(n_nationkey + 0))) " +
        "FROM nation") == true)
    // the retained-hash budget bounds the map (2048 smallest of 5000)
    assert(one(
      "SELECT cardinality(hash_counts(make_set_digest(x))) " +
        "FROM range(5000) AS t(x)") == graft.functions.ThetaExprs.SdMaxHashes)
    // NULL digest propagates
    assert(one("SELECT hash_counts(CAST(NULL AS VARBINARY))") == null)
  }

  // ---- round-9 bridge batch ----

  test("zip pairs arrays positionally") {
    // element_at is 1-based in both dialects ([] subscripts differ:
    // Trino 1-based, Spark 0-based — element_at is the portable spelling)
    assert(one("SELECT element_at(zip(array(1,2), array('a','b')), 1)['1']") == "a")
    assert(one("SELECT element_at(zip(array(1,2), array('a','b')), 2)['0']") == 2)
    assert(one("SELECT cardinality(zip(array(1,2,3), array('a','b')))") == 3)
  }

  test("hex / base64 / base64url codecs round-trip") {
    assert(one("SELECT to_hex(CAST('ab' AS BINARY))") == "6162")
    assert(one("SELECT CAST(from_hex('6162') AS STRING)") == "ab")
    assert(one("SELECT to_base64(CAST('hello' AS BINARY))") == "aGVsbG8=")
    assert(one("SELECT CAST(from_base64('aGVsbG8=') AS STRING)") == "hello")
    // 0xFBEF en­codes to '++8=' standard / '--8=' url-safe
    assert(one("SELECT to_base64url(from_hex('FBEF'))") == "--8=")
    assert(one("SELECT to_hex(from_base64url('--8='))") == "FBEF")
    assert(one("SELECT CAST(from_base64url(to_base64url(CAST('x?y' AS BINARY))) AS STRING)") == "x?y")
  }

  test("sha1/sha256/sha512 return VARBINARY (Trino), not hex strings") {
    // NIST FIPS 180 vectors for "abc"
    assert(one("SELECT to_hex(sha1(CAST('abc' AS BINARY)))")
      == "A9993E364706816ABA3E25717850C26C9CD0D89D")
    assert(one("SELECT to_hex(sha256(CAST('abc' AS BINARY)))")
      == "BA7816BF8F01CFEA414140DE5DAE2223B00361A396177A9CB410FF61F20015AD")
    assert(one("SELECT length(sha512(CAST('abc' AS BINARY)))") == 64)
  }

  test("bitwise function family (64-bit two's complement)") {
    assert(one("SELECT bitwise_and(19, 25)") == 17)
    assert(one("SELECT bitwise_or(19, 25)") == 27)
    assert(one("SELECT bitwise_xor(19, 25)") == 10)
    assert(one("SELECT bitwise_not(-12)") == 11)
    assert(one("SELECT bitwise_left_shift(1, 7)") == 128L)
    assert(one("SELECT bitwise_right_shift(-1, 62)") == 3L)   // logical
    assert(one("SELECT bitwise_right_shift_arithmetic(-1, 62)") == -1L)
  }

  test("bit_count matches Trino's width semantics") {
    assert(one("SELECT bit_count(9)") == 2)
    assert(one("SELECT bit_count(9, 8)") == 2)
    assert(one("SELECT bit_count(-7, 64)") == 62)
    assert(one("SELECT bit_count(-7, 8)") == 6)   // 8-bit two's complement 11111001
  }

  test("truncate rounds toward zero") {
    // truncate() trips the read-only classifier's TRUNCATE keyword on the
    // guarded surface (same documented false positive as merge(); the
    // reference's guard shares it) — exercised at library level.
    def lib(sql: String): Any = spark.sql(sql).collect().head.get(0)
    assert(lib("SELECT truncate(17.18)") == 17.0)
    assert(lib("SELECT truncate(-17.18)") == -17.0)
    assert(lib("SELECT truncate(17.18, 1)") == 17.1)
    assert(lib("SELECT truncate(-17.18, 1)") == -17.1)
  }

  test("index is the strpos alias; starts_with bridges startswith") {
    assert(one("SELECT index('high', 'ig')") == 2)
    assert(one("SELECT starts_with('trino', 'tri')") == true)
    assert(one("SELECT starts_with('trino', 'ino')") == false)
  }

  test("regexp_split and split_to_map") {
    assert(one("SELECT cardinality(regexp_split('one11two22three', '\\d+'))") == 3)
    assert(one("SELECT regexp_split('a.b:c', '[.:]')[1]") == "b")
    assert(one("SELECT split_to_map('a=1,b=2', ',', '=')['b']") == "2")
  }

  test("format uses printf semantics like Trino") {
    assert(one("SELECT format('%s-%03d', 'q', 7)") == "q-007")
  }

  test("cosine_distance = 1 - cosine_similarity on dense arrays") {
    val d = one("SELECT cosine_distance(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), " +
      "CAST(array(0.0, 1.0) AS ARRAY<FLOAT>))").asInstanceOf[Double]
    assert(math.abs(d - 1.0) < 1e-9)
    val same = one("SELECT cosine_distance(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), " +
      "CAST(array(1.0, 2.0) AS ARRAY<FLOAT>))").asInstanceOf[Double]
    assert(math.abs(same) < 1e-6)
  }

  test("json_parse validates; json_format is the identity on engine JSON") {
    assert(one("""SELECT json_format(json_parse('{"a": 1}'))""") == """{"a": 1}""")
    assert(one("SELECT json_parse(NULL)") == null)
    assert(one("SELECT try(json_parse('not json'))") == null)
    val err = qs.execute("SELECT json_parse('not json')")
    assert(err.isLeft, "bare json_parse on invalid input must error")
  }

  test("hamming_distance counts differing code points, errors on length mismatch") {
    assert(one("SELECT hamming_distance('karolin', 'kathrin')") == 3L)
    assert(one("SELECT hamming_distance('', '')") == 0L)
    // supplementary plane: one code point each, equal length in Trino terms
    assert(one("SELECT hamming_distance('😀', '😁')") == 1L)
    assert(one("SELECT try(hamming_distance('ab', 'abc'))") == null)
  }

  test("normalize applies Unicode normalization forms (bare-keyword and literal spellings)") {
    // U+00C5 (Å precomposed) NFD-decomposes to A + U+030A
    assert(one("SELECT length(normalize('Å', NFD))") == 2)
    assert(one("SELECT length(normalize('Å'))") == 1)          // NFC default
    assert(one("SELECT normalize('Å', 'NFC') = 'Å'") == true)
    // NFKC folds compatibility characters: U+FB01 (fi ligature) → "fi"
    assert(one("SELECT normalize('ﬁ', NFKC)") == "fi")
    val err = qs.execute("SELECT normalize('x', 'BOGUS')")
    assert(err.isLeft)
  }

  test("histogram builds per-value counts inside the aggregate") {
    val m = qs.execute(
      "SELECT histogram(l_returnflag) FROM lineitem").toOption.get.rows.head.head
      .asInstanceOf[Map[String, Long]]
    val exact = spark.sql(
      "SELECT l_returnflag, COUNT(*) FROM lineitem GROUP BY 1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == exact)
  }

  test("histogram groups duplicates across partitions (merge path)") {
    val m = qs.execute(
      "SELECT histogram(x) FROM (SELECT l_orderkey % 3 AS x FROM lineitem)")
      .toOption.get.rows.head.head.asInstanceOf[Map[Long, Long]]
    assert(m.keySet == Set(0L, 1L, 2L))
    assert(m.values.sum == spark.table("lineitem").count())
  }

  test("multimap_agg groups values per key") {
    val m = qs.execute(
      "SELECT multimap_agg(n_regionkey, n_name) FROM nation")
      .toOption.get.rows.head.head.asInstanceOf[Map[Long, scala.collection.Seq[String]]]
    assert(m.size == 5)
    assert(m.values.map(_.size).sum == 25)
    val expect1 = spark.sql("SELECT n_name FROM nation WHERE n_regionkey = 1")
      .collect().map(_.getString(0)).toSet
    assert(m(1L).toSet == expect1)
  }

  test("approx_most_frequent returns the top-k value→count map") {
    val m = qs.execute(
      "SELECT approx_most_frequent(3, event_type, 64) FROM events")
      .toOption.get.rows.head.head.asInstanceOf[Map[String, Long]]
    assert(m.size == 3)
    val exact = spark.sql(
      "SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY n DESC LIMIT 3")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // capacity 64 >> true cardinality: no eviction, counts exact
    assert(m == exact)
  }

  test("millisecond returns ms-of-second; parse_datetime inverts format_datetime") {
    assert(one("SELECT millisecond(TIMESTAMP '2001-08-22 03:04:05.321')") == 321L)
    assert(one("SELECT millisecond(TIMESTAMP '2001-08-22 03:04:05')") == 0L)
    assert(one("SELECT CAST(parse_datetime('1995/06/17 12:30', 'yyyy/MM/dd HH:mm') AS STRING)")
      == "1995-06-17 12:30:00")
    // Joda 'Y' (year-of-era) translated, not passed through as week-year
    assert(one("SELECT CAST(parse_datetime('2020-01-01', 'YYYY-MM-dd') AS STRING)")
      == "2020-01-01 00:00:00")
  }

  test("human_readable_seconds renders Trino's unit decomposition") {
    assert(one("SELECT human_readable_seconds(96)") == "1 minute, 36 seconds")
    assert(one("SELECT human_readable_seconds(3762)") == "1 hour, 2 minutes, 42 seconds")
    assert(one("SELECT human_readable_seconds(56363463)") ==
      "93 weeks, 1 day, 8 hours, 31 minutes, 3 seconds")
    assert(one("SELECT human_readable_seconds(0)") == "0 seconds")
    assert(one("SELECT human_readable_seconds(1)") == "1 second")
    assert(one("SELECT human_readable_seconds(86400)") == "1 day")
  }

  test("split treats the delimiter as a literal (Trino), not a regex (Spark)") {
    assert(one("SELECT split('a.b.c', '.')[1]") == "b")          // Spark regex split would yield []
    assert(one("SELECT split('x||y', '|')[1]") == "")   // ['x','','y'], not a regex alternation
    assert(one("SELECT split('x||y', '|')[2]") == "y")
    assert(one("SELECT cardinality(split('a,b,c', ','))") == 3)
    // 3-arg limit: last element keeps the rest
    assert(one("SELECT split('a,b,c', ',', 2)[1]") == "b,c")
    // non-literal delimiter path
    assert(one("SELECT split('a.b', substr('.x', 1, 1))[0]") == "a")
    // split_part is NOT captured by the rewrite
    assert(one("SELECT split_part('a,b,c', ',', 2)") == "b")
    // and masked regions are untouched: 'split(' inside a string literal
    assert(one("SELECT 'use split(x) here'") == "use split(x) here")
    // the LIBRARY surface keeps Spark's regex semantics (the rewrite is
    // scoped to execute_query; functions.split resolves by name in
    // Spark 4, so a global override would hijack the engine's own
    // tokenizers — regression-pinned here)
    assert(spark.sql("SELECT split('a1b23c', '[0-9]+')").collect().head
      .getSeq[String](0) == Seq("a", "b", "c"))
  }

  test("replace supports Trino's 2-arg delete form") {
    assert(one("SELECT replace('axbxc', 'x')") == "abc")
    assert(one("SELECT replace('axbxc', 'x', '-')") == "a-b-c")
  }

  test("ngrams emits sliding subsequences") {
    assert(one("SELECT ngrams(array('a','b','c','d'), 2)[0][1]") == "b")
    assert(one("SELECT cardinality(ngrams(array('a','b','c','d'), 2))") == 3)
    assert(one("SELECT cardinality(ngrams(array('a','b'), 5))") == 1)   // n > len → whole array
    assert(one("SELECT ngrams(array('a','b'), 5)[0][0]") == "a")
  }

  test("entropy matches the closed form on count values") {
    // {3,1}: S=4 → log2(4) - (3*log2 3)/4 = 2 - 1.18872... = 0.81128...
    val e = one("SELECT entropy(c) FROM (VALUES 3, 1) AS t(c)").asInstanceOf[Double]
    val expect = 2.0 - 3.0 * (math.log(3.0) / math.log(2.0)) / 4.0
    assert(math.abs(e - expect) < 1e-12, s"$e vs $expect")
    // uniform counts → log2(n); zero/NULL counts contribute nothing
    val u = one("SELECT entropy(c) FROM (VALUES 5, 5, 5, 5) AS t(c)").asInstanceOf[Double]
    assert(math.abs(u - 2.0) < 1e-12)
    assert(one("SELECT entropy(c) FROM (VALUES 7, 0, NULL) AS t(c)") == 0.0)
  }

  test("json_array_get supports negative from-the-end indices") {
    assert(one("""SELECT json_array_get('["a","b","c"]', 1)""") == "b")
    assert(one("""SELECT json_array_get('["a","b","c"]', -1)""") == "c")
    assert(one("""SELECT json_array_get('["a","b","c"]', -3)""") == "a")
    assert(one("""SELECT json_array_get('["a","b"]', -5)""") == null)
    assert(one("""SELECT json_array_get('{"not":"array"}', -1)""") == null)
    // dynamic index expression takes the runtime-dispatch path
    assert(one("""SELECT json_array_get('["a","b","c"]', 1 - 2)""") == "c")
  }

  test("regexp_extract/_all default to the whole match (group 0), like Trino") {
    // Spark's own 2-arg default is group 1 — the shim must return group 0
    assert(one("SELECT regexp_extract('1a 2b 3c', '(\\d)([a-z])')") == "1a")
    assert(one("SELECT regexp_extract('1a 2b 3c', '(\\d)([a-z])', 2)") == "a")
    val all = one("SELECT regexp_extract_all('1a 2b', '(\\d)([a-z])')")
      .asInstanceOf[scala.collection.Seq[_]]
    assert(all == Seq("1a", "2b"))
    assert(one("SELECT regexp_extract_all('1a 2b', '(\\d)([a-z])', 1)")
      .asInstanceOf[scala.collection.Seq[_]] == Seq("1", "2"))
  }

  test("regexp_position returns 1-based char position or -1") {
    assert(one("SELECT regexp_position('I have 23 apples', '\\d+')") == 8)
    assert(one("SELECT regexp_position('no digits', '\\d+')") == -1)
    // 3/4-arg forms: search from a 1-based start, select the n-th match
    assert(one("SELECT regexp_position('a1b2c3', '\\d', 3)") == 4)
    assert(one("SELECT regexp_position('a1b2c3', '\\d', 1, 3)") == 6)
    assert(one("SELECT regexp_position('a1b2c3', '\\d', 3, 2)") == 6)
    assert(one("SELECT regexp_position('a1b2c3', '\\d', 1, 4)") == -1)
    assert(one("SELECT regexp_position('a1b2c3', '\\d', 99)") == -1)
    // non-positive start surfaces as a query error (the service maps
    // executor-side INVALID_FUNCTION_ARGUMENTs to Left)
    assert(intercept[AssertionError](
      one("SELECT regexp_position('abc', 'b', 0)"))
      .getMessage.contains("positive"))
  }

  test("day_of_month aliases day") {
    assert(one("SELECT day_of_month(DATE '1995-03-17')") == 17)
  }

  test("is_finite / is_infinite classify specials") {
    assert(one("SELECT is_finite(1.5)") == true)
    assert(one("SELECT is_finite(infinity())") == false)
    assert(one("SELECT is_finite(nan())") == false)
    assert(one("SELECT is_infinite(infinity())") == true)
    assert(one("SELECT is_infinite(-infinity())") == true)
    assert(one("SELECT is_infinite(nan())") == false)
    assert(one("SELECT is_infinite(2.0)") == false)
  }

  test("trim_array drops trailing elements; errors past the end like Trino") {
    assert(one("SELECT trim_array(array(1, 2, 3, 4), 1)").asInstanceOf[scala.collection.Seq[_]] == Seq(1, 2, 3))
    assert(one("SELECT trim_array(array(1, 2), 2)").asInstanceOf[scala.collection.Seq[_]] == Seq())
    assert(one("SELECT try(trim_array(array(1, 2), 3))") == null)
  }

  test("json_array_contains dispatches on the value's type") {
    assert(one("""SELECT json_array_contains('[1, 2, 3]', 2)""") == true)
    assert(one("""SELECT json_array_contains('[1, 2, 3]', 5)""") == false)
    assert(one("""SELECT json_array_contains('[1.5, 2.5]', 2.5)""") == true)
    assert(one("""SELECT json_array_contains('[true, false]', true)""") == true)
    assert(one("""SELECT json_array_contains('["a", "b"]', 'b')""") == true)
    assert(one("""SELECT json_array_contains('["a", "b"]', 'c')""") == false)
  }

  test("parse_duration and to_milliseconds round-trip") {
    assert(one("SELECT to_milliseconds(parse_duration('42 ms'))") == 42L)
    assert(one("SELECT to_milliseconds(parse_duration('3.5 s'))") == 3500L)
    assert(one("SELECT to_milliseconds(parse_duration('1.5m'))") == 90000L)
    assert(one("SELECT to_milliseconds(parse_duration('2h'))") == 7200000L)
    assert(one("SELECT to_milliseconds(parse_duration('1 d'))") == 86400000L)
    assert(one("SELECT to_milliseconds(parse_duration('1500 us'))") == 1L)
    assert(one("SELECT to_milliseconds(INTERVAL '1 02:00:00' DAY TO SECOND)") == 93600000L)
  }

  test("wilson interval bounds match the closed form") {
    // s=10, n=25, z=1.96: p̂=0.4
    val z = 1.96; val p = 0.4; val n = 25.0
    val z2n = z * z / n
    val center = p + z2n / 2
    val margin = z * math.sqrt(p * (1 - p) / n + z2n / (4 * n))
    val denom = 1 + z2n
    val lo = one("SELECT wilson_interval_lower(10, 25, 1.96)").asInstanceOf[Double]
    val hi = one("SELECT wilson_interval_upper(10, 25, 1.96)").asInstanceOf[Double]
    assert(math.abs(lo - (center - margin) / denom) < 1e-12)
    assert(math.abs(hi - (center + margin) / denom) < 1e-12)
    assert(lo < p && p < hi)
  }

  test("normal_cdf / inverse_normal_cdf agree with known values and invert") {
    val mid = one("SELECT normal_cdf(0, 1, 0)").asInstanceOf[Double]
    assert(math.abs(mid - 0.5) < 1e-12)
    val p975 = one("SELECT normal_cdf(0, 1, 1.959963984540054)").asInstanceOf[Double]
    assert(math.abs(p975 - 0.975) < 1e-9)
    val q = one("SELECT inverse_normal_cdf(0, 1, 0.975)").asInstanceOf[Double]
    assert(math.abs(q - 1.959963984540054) < 1e-6)
    val shifted = one("SELECT normal_cdf(10, 2, 10)").asInstanceOf[Double]
    assert(math.abs(shifted - 0.5) < 1e-12)
    // sd <= 0 errors like Trino; null under try()
    assert(one("SELECT try(normal_cdf(0, 0, 1))") == null)
  }

  test("beta_cdf / inverse_beta_cdf: uniform special case and inversion") {
    // Beta(1,1) is uniform on [0,1]
    val u = one("SELECT beta_cdf(1, 1, 0.3)").asInstanceOf[Double]
    assert(math.abs(u - 0.3) < 1e-12)
    val v = one("SELECT beta_cdf(2, 5, 0.5)").asInstanceOf[Double]
    val back = one("SELECT inverse_beta_cdf(2, 5, " + v + ")").asInstanceOf[Double]
    assert(math.abs(back - 0.5) < 1e-9)
    assert(one("SELECT try(beta_cdf(1, 1, 2.0))") == null)
  }

  test("max(x, n)/min(x, n) return the n extreme values; 1-arg forms stay native") {
    assert(one("SELECT max(x, 2) FROM (VALUES (1), (3), (2), (NULL)) AS t(x)")
      .asInstanceOf[scala.collection.Seq[_]] == Seq(3, 2))
    assert(one("SELECT min(x, 3) FROM (VALUES (5), (1), (4), (2)) AS t(x)")
      .asInstanceOf[scala.collection.Seq[_]] == Seq(1, 2, 4))
    // n past the group size truncates; plain max/min delegate to Spark
    assert(one("SELECT max(x, 9) FROM (VALUES (1), (2)) AS t(x)")
      .asInstanceOf[scala.collection.Seq[_]] == Seq(2, 1))
    assert(one("SELECT max(x) FROM (VALUES (1), (3)) AS t(x)") == 3)
    assert(one("SELECT min(s) FROM (VALUES ('b'), ('a')) AS t(s)") == "a")
  }

  test("char2hexint returns the uppercase UTF-16BE hex (Teradata)") {
    assert(one("SELECT char2hexint('Z')") == "005A")
    assert(one("SELECT char2hexint('abc')") == "006100620063")
    assert(one("SELECT char2hexint('')") == "")
    assert(one("SELECT char2hexint(CAST(NULL AS STRING))") == null)
  }

  test("max_by/min_by with n return ordered top-n arrays, skipping null keys") {
    val top = one(
      """SELECT max_by(name, score, 2) FROM (VALUES
        |  ('a', 1), ('b', 3), ('c', 2), ('d', NULL)) AS t(name, score)""".stripMargin)
      .asInstanceOf[scala.collection.Seq[_]]
    assert(top == Seq("b", "c"))
    val bottom = one(
      """SELECT min_by(name, score, 3) FROM (VALUES
        |  ('a', 1), ('b', 3), ('c', 2), ('d', NULL)) AS t(name, score)""".stripMargin)
      .asInstanceOf[scala.collection.Seq[_]]
    assert(bottom == Seq("a", "c", "b"))
    // n larger than the group truncates; 2-arg form still the native scalar
    assert(one("SELECT min_by(name, score, 9) FROM (VALUES ('a', 1)) AS t(name, score)")
      .asInstanceOf[scala.collection.Seq[_]] == Seq("a"))
    assert(one("SELECT max_by(name, score) FROM (VALUES ('a', 1), ('b', 3)) AS t(name, score)") == "b")
  }

  test("hmac functions match RFC test vectors") {
    // RFC 2202 test case 2: HMAC-SHA1("Jefe", "what do ya want for nothing?")
    assert(one("SELECT to_hex(hmac_sha1('what do ya want for nothing?', 'Jefe'))")
      == "EFFCDF6AE5EB2FA2D27416D5F184DF9C259A7C79")
    // RFC 4231 test case 2 (same inputs, HMAC-SHA256 / HMAC-SHA512)
    assert(one("SELECT to_hex(hmac_sha256('what do ya want for nothing?', 'Jefe'))")
      == "5BDCC146BF60754E6A042426089575C75A003F089D2739839DEC58B964EC3843")
    assert(one("SELECT to_hex(hmac_sha512('what do ya want for nothing?', 'Jefe'))")
      == ("164B7A7BFCF819E2E395FBE73B56E0A387BD64222E831FD610270CD7EA250554" +
          "9758BF75C05A994A6D034F65F8F0E6FDCAEAB1A34D4A6B4B636E070A38BCE737"))
    // RFC 2202 HMAC-MD5 test case 2
    assert(one("SELECT to_hex(hmac_md5('what do ya want for nothing?', 'Jefe'))")
      == "750C783E6AB0B503EAA86E310A5DB738")
  }

  test("big-endian and IEEE-754 byte bridges round-trip") {
    assert(one("SELECT to_hex(to_big_endian_64(1))") == "0000000000000001")
    assert(one("SELECT from_big_endian_64(to_big_endian_64(-123456789))") == -123456789L)
    assert(one("SELECT to_hex(to_big_endian_32(255))") == "000000FF")
    assert(one("SELECT from_big_endian_32(to_big_endian_32(-42))") == -42)
    assert(one("SELECT from_ieee754_64(to_ieee754_64(3.1415))") == 3.1415)
    assert(one("SELECT to_hex(to_ieee754_64(1.0))") == "3FF0000000000000")
    assert(one("SELECT from_ieee754_32(to_ieee754_32(CAST(2.5 AS FLOAT)))") == 2.5f)
    // wrong-length input errors like Trino; null under try()
    assert(one("SELECT try(from_big_endian_64(to_big_endian_32(1)))") == null)
  }

  test("array_duplicates / array_has_duplicates") {
    assert(one("SELECT array_duplicates(array(1, 2, 1, 3, 2))")
      .asInstanceOf[scala.collection.Seq[_]] == Seq(1, 2))
    assert(one("SELECT array_duplicates(array(1, 2, 3))")
      .asInstanceOf[scala.collection.Seq[_]] == Seq())
    // a repeated NULL is itself a duplicate (null-safe equality)
    assert(one("SELECT cardinality(array_duplicates(array(NULL, NULL, 1)))") == 1)
    assert(one("SELECT array_has_duplicates(array(1, 2, 1))") == true)
    assert(one("SELECT array_has_duplicates(array(1, 2, 3))") == false)
    assert(one("SELECT array_has_duplicates(array(NULL, NULL))") == true)
  }

  test("current_timezone returns the session zone") {
    assert(one("SELECT current_timezone()") == "UTC")
  }

  test("to_utf8 / from_utf8 round-trip and replace invalid sequences") {
    assert(one("SELECT to_hex(to_utf8('abc'))") == "616263")
    assert(one("SELECT from_utf8(to_utf8('héllo'))") == "héllo")
    // 0xFF is never valid UTF-8 → replaced with U+FFFD by default
    assert(one("SELECT from_utf8(from_hex('61FF62'))") == "a�b")
    // custom replacement: single char or empty
    assert(one("SELECT from_utf8(from_hex('61FF62'), '?')") == "a?b")
    assert(one("SELECT from_utf8(from_hex('61FF62'), '')") == "ab")
    // truncated multi-byte tail is also invalid
    assert(one("SELECT from_utf8(from_hex('61C3'), '?')") == "a?")
    // multi-char replacement rejected like Trino; null under try()
    assert(one("SELECT try(from_utf8(from_hex('FF'), 'xy'))") == null)
  }

  test("strrpos finds the last occurrence") {
    assert(one("SELECT strrpos('abcabc', 'bc')") == 5L)
    assert(one("SELECT strrpos('abcabc', 'd')") == 0L)
    assert(one("SELECT strrpos('abc', 'abc')") == 1L)
    assert(one("SELECT strrpos(NULL, 'a')") == null)
  }

  test("split_part returns NULL past the last field like Trino") {
    assert(one("SELECT split_part('a-b-c', '-', 2)") == "b")
    assert(one("SELECT split_part('a-b-c', '-', 3)") == "c")
    // Spark's builtin returns '' here; Trino returns NULL
    assert(one("SELECT split_part('a-b-c', '-', 4)") == null)
    assert(one("SELECT split_part('abc', '-', 1)") == "abc")
    assert(one("SELECT split_part('abc', '-', 2)") == null)
    // in-range empty fields are real fields, not NULL
    assert(one("SELECT split_part('a--c', '-', 2)") == "")
    assert(one("SELECT split_part(NULL, '-', 1)") == null)
    // index <= 0 raises like Trino's INVALID_FUNCTION_ARGUMENT (Spark's
    // builtin would COUNT BACKWARD for negatives — r10 ADVICE)
    Seq(0, -1, -3).foreach { i =>
      val e = intercept[Throwable](one(s"SELECT split_part('a-b-c', '-', $i)"))
      assert(e.getMessage.contains("greater than zero"), s"idx=$i: $e")
    }
  }

  test("json_size and is_json_scalar") {
    assert(one("""SELECT json_size('{"x":{"a":1,"b":2}}', '$.x')""") == 2)
    assert(one("""SELECT json_size('{"x":[1,2,3]}', '$.x')""") == 3)
    assert(one("""SELECT json_size('{"x":{"a":[1,2]}}', '$.x.a')""") == 2)
    assert(one("""SELECT json_size('{"x":1}', '$.x')""") == 0)
    assert(one("""SELECT json_size('[[1,2],[3]]', '$[0]')""") == 2)
    assert(one("""SELECT json_size('{"a b":[1]}', '$["a b"]')""") == 1)
    // missing path → NULL; invalid JSON raises (null under try())
    assert(one("""SELECT json_size('{"x":1}', '$.y')""") == null)
    assert(one("""SELECT try(json_size('not json', '$'))""") == null)
    assert(one("SELECT is_json_scalar('1')") == true)
    assert(one("SELECT is_json_scalar('\"abc\"')") == true)
    assert(one("SELECT is_json_scalar('null')") == true)
    assert(one("SELECT is_json_scalar('[1,2]')") == false)
    assert(one("""SELECT is_json_scalar('{"a":1}')""") == false)
    assert(one("SELECT try(is_json_scalar('not json'))") == null)
  }

  test("format_number uses K/M/B/T/Q suffixes with 3 significant digits") {
    assert(one("SELECT format_number(123456)") == "123K")
    assert(one("SELECT format_number(1000000)") == "1M")
    assert(one("SELECT format_number(1234)") == "1.23K")
    assert(one("SELECT format_number(12345)") == "12.3K")
    assert(one("SELECT format_number(999)") == "999")
    assert(one("SELECT format_number(-1234567890)") == "-1.23B")
    assert(one("SELECT format_number(2500000000000000)") == "2.5Q")
    // the 2-arg form stays Spark's own format_number(x, d)
    assert(one("SELECT format_number(1234.5678, 2)") == "1,234.57")
  }

  test("map_top_n family keeps the n largest entries") {
    val m = "map_from_entries(array(struct('a', 1), struct('b', 3), struct('c', 2)))"
    assert(one(s"SELECT map_entries(map_top_n($m, 2))")
      .asInstanceOf[scala.collection.Seq[_]].map(_.toString).sorted
      == Seq("[b,3]", "[c,2]"))
    assert(one(s"SELECT map_top_n_keys($m, 2)")
      .asInstanceOf[scala.collection.Seq[_]] == Seq("c", "b"))
    assert(one(s"SELECT map_top_n_values($m, 2)")
      .asInstanceOf[scala.collection.Seq[_]] == Seq(3, 2))
    // n beyond size keeps everything
    assert(one(s"SELECT cardinality(map_top_n($m, 10))") == 3)
  }

  test("multimap_from_entries groups values per key") {
    val r = one("SELECT multimap_from_entries(array(struct('k1', 1), struct('k2', 2), struct('k1', 3)))")
      .asInstanceOf[Map[String, Any]]
    assert(r("k1") == Seq(1, 3))
    assert(r("k2") == Seq(2))
  }

  test("word_stem applies the Snowball english algorithm") {
    val vectors = Map(
      // step 1a/1b families
      "running" -> "run", "hopping" -> "hop", "hoping" -> "hope",
      // agreed: 1b eed→ee gives agree, then step 5 drops the e (in R1,
      // "agre" ends in a vowel so no short-syllable guard) — Snowball
      // demo output is "agre", not "agree"
      "meeting" -> "meet", "meetings" -> "meet", "agreed" -> "agre",
      "feed" -> "feed", "caresses" -> "caress", "ties" -> "tie",
      "cries" -> "cri", "gaps" -> "gap", "gas" -> "gas",
      // y → i
      "happy" -> "happi", "cry" -> "cri", "by" -> "by", "say" -> "say",
      // exceptional forms and invariants
      "dying" -> "die", "lying" -> "lie", "news" -> "news",
      "sky" -> "sky", "skies" -> "sky", "early" -> "earli",
      "proceed" -> "proceed",
      // derivational suffix chains (steps 2-5)
      "national" -> "nation", "rational" -> "ration",
      "conditional" -> "condit", "electricity" -> "electr",
      "generate" -> "generat", "generous" -> "generous",
      "hopefulness" -> "hope", "sensational" -> "sensat")
    vectors.foreach { case (in, out) =>
      assert(one(s"SELECT word_stem('$in')") == out, s"word_stem($in)")
    }
    // explicit language arg: en works, others raise (null under try())
    assert(one("SELECT word_stem('running', 'en')") == "run")
    assert(one("SELECT try(word_stem('laufen', 'de'))") == null)
  }

  test("listagg WITHIN GROUP parses natively (no shim needed)") {
    assert(one("SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) " +
      "FROM (VALUES ('b'), ('a'), ('c')) AS t(x)") == "a,b,c")
    assert(one("SELECT listagg(DISTINCT x, ',') WITHIN GROUP (ORDER BY x) " +
      "FROM (VALUES ('b'), ('a'), ('b')) AS t(x)") == "a,b")
  }

  test("xxhash64 returns the standard seed-0 XXH64 as 8-byte varbinary") {
    // reference vectors: XXH64('') = EF46DB3751D8E999, XXH64('abc') = 44BC2CF5AD770999
    assert(one("SELECT to_hex(xxhash64(to_utf8('')))") == "EF46DB3751D8E999")
    assert(one("SELECT to_hex(xxhash64(to_utf8('abc')))") == "44BC2CF5AD770999")
  }

  test("reduce_agg folds groups through the input lambda") {
    assert(one("""SELECT reduce_agg(x, 0, (s, v) -> s + v, (a, b) -> a + b)
      FROM (VALUES 1, 2, 3, 4) AS t(x)""") == 10)
    assert(one("""SELECT reduce_agg(x, 1, (s, v) -> s * v, (a, b) -> a * b)
      FROM (VALUES 2, 3, 4) AS t(x)""") == 24)
    // NULL inputs are skipped like any aggregate input
    assert(one("""SELECT reduce_agg(x, 0, (s, v) -> s + v, (a, b) -> a + b)
      FROM (VALUES 1, NULL, 3) AS t(x)""") == 4)
  }

  test("map_union merges maps across rows") {
    val r = one("""SELECT map_union(m) FROM (
      SELECT map_from_entries(array(struct('a', 1), struct('b', 2))) AS m
      UNION ALL
      SELECT map_from_entries(array(struct('b', 9), struct('c', 3))) AS m)""")
      .asInstanceOf[Map[String, Any]]
    assert(r.keys.toSeq.sortBy(_.toString) == Seq("a", "b", "c"))
    assert(r("a") == 1 && r("c") == 3)
    assert(r("b") == 2 || r("b") == 9) // collision winner: first-seen
  }

  test("distribution CDF family matches closed-form values") {
    def dbl(sql: String): Double = one(sql).asInstanceOf[Double]
    // binomial_cdf(10, 0.5, 5) = 638/1024 (computed via the regularized
    // incomplete beta, so compare with tolerance)
    assert(math.abs(dbl("SELECT binomial_cdf(10, 0.5, 5)") - 0.623046875) < 1e-12)
    assert(one("SELECT cauchy_cdf(0.0, 1.0, 0.0)") == 0.5)
    assert(one("SELECT laplace_cdf(0.0, 1.0, 0.0)") == 0.5)
    // chi²(1) CDF at 1 = P(|Z| < 1)
    assert(math.abs(dbl("SELECT chi_squared_cdf(1.0, 1.0)") - 0.6826894921370859) < 1e-12)
    // Poisson(1) CDF at 0 = e⁻¹; Exp(1) ≡ gamma(1,1) ≡ weibull(1,1) CDF at 1 = 1 − e⁻¹
    assert(math.abs(dbl("SELECT poisson_cdf(1.0, 0)") - math.exp(-1)) < 1e-12)
    assert(math.abs(dbl("SELECT gamma_cdf(1.0, 1.0, 1.0)") - (1 - math.exp(-1))) < 1e-12)
    assert(math.abs(dbl("SELECT weibull_cdf(1.0, 1.0, 1.0)") - (1 - math.exp(-1))) < 1e-12)
    // the Poisson(3) median is 3; quantile returns INTEGER like Trino
    assert(one("SELECT inverse_poisson_cdf(3.0, 0.5)") == 3)
  }

  test("distribution CDF inverses round-trip and reject out-of-domain args") {
    def dbl(sql: String): Double = one(sql).asInstanceOf[Double]
    assert(math.abs(dbl("SELECT inverse_cauchy_cdf(1.0, 2.0, cauchy_cdf(1.0, 2.0, 3.0))") - 3.0) < 1e-9)
    assert(math.abs(dbl("SELECT inverse_chi_squared_cdf(3.0, chi_squared_cdf(3.0, 2.0))") - 2.0) < 1e-6)
    assert(math.abs(dbl("SELECT inverse_f_cdf(2.0, 5.0, f_cdf(2.0, 5.0, 3.0))") - 3.0) < 1e-6)
    assert(math.abs(dbl("SELECT inverse_gamma_cdf(2.0, 2.0, gamma_cdf(2.0, 2.0, 3.0))") - 3.0) < 1e-6)
    assert(math.abs(dbl("SELECT inverse_laplace_cdf(0.0, 1.0, laplace_cdf(0.0, 1.0, 0.7))") - 0.7) < 1e-9)
    assert(math.abs(dbl("SELECT inverse_weibull_cdf(2.0, 3.0, weibull_cdf(2.0, 3.0, 1.5))") - 1.5) < 1e-9)
    // out-of-domain arguments raise like Trino; null under try()
    assert(one("SELECT try(chi_squared_cdf(-1.0, 1.0))") == null)
    assert(one("SELECT try(binomial_cdf(0, 0.5, 1))") == null)
    assert(one("SELECT try(inverse_poisson_cdf(2.0, 1.0))") == null)
    assert(one("SELECT try(weibull_cdf(0.0, 1.0, 1.0))") == null)
  }

  test("checksum is order-insensitive and duplicate-sensitive") {
    val a = one("SELECT checksum(x) FROM (VALUES 1, 2, 3) AS t(x)")
    val b = one("SELECT checksum(x) FROM (VALUES 3, 1, 2) AS t(x)")
    val c = one("SELECT checksum(x) FROM (VALUES 3, 1, 2, 2) AS t(x)")
    assert(a == b)
    assert(a != c)
    assert(one("SELECT checksum(l_orderkey) FROM lineitem").isInstanceOf[Long])
  }

  test("at_timezone renders the instant in the target zone (UTC sessions)") {
    // 12:00 UTC on a January day is 07:00 in America/New_York (UTC-5)
    assert(one("SELECT CAST(at_timezone(TIMESTAMP '2020-01-15 12:00:00', 'America/New_York') AS STRING)")
      == "2020-01-15 07:00:00")
    // and 08:00 in July (DST, UTC-4)
    assert(one("SELECT CAST(at_timezone(TIMESTAMP '2020-07-15 12:00:00', 'America/New_York') AS STRING)")
      == "2020-07-15 08:00:00")
  }

  test("with_timezone interprets a wall-clock in the zone (inverse of at_timezone)") {
    assert(one("SELECT CAST(with_timezone(TIMESTAMP '2020-01-15 07:00:00', 'America/New_York') AS STRING)")
      == "2020-01-15 12:00:00")
    assert(one("""SELECT CAST(at_timezone(with_timezone(TIMESTAMP '2021-03-04 05:06:07', 'Asia/Tokyo'),
                 'Asia/Tokyo') AS STRING)""") == "2021-03-04 05:06:07")
  }

  test("parse_data_size uses binary multipliers and floors (Trino doc vectors)") {
    assert(one("SELECT CAST(parse_data_size('2.3MB') AS STRING)") == "2411724")
    assert(one("SELECT CAST(parse_data_size('1kB') AS STRING)") == "1024")
    assert(one("SELECT CAST(parse_data_size('755B') AS STRING)") == "755")
    assert(one("SELECT CAST(parse_data_size('4TB') AS STRING)") == "4398046511104")
    assert(one("SELECT try(parse_data_size('abc'))") == null)
    assert(one("SELECT try(parse_data_size('2.3mb'))") == null) // unit is case-sensitive
  }

  test("murmur3 matches Guava's murmur3_128 on random inputs (differential oracle)") {
    val rnd = new scala.util.Random(7)
    for (len <- Seq(0, 1, 7, 8, 9, 15, 16, 17, 31, 64, 1000)) {
      val bytes = Array.fill[Byte](len)(rnd.nextInt().toByte)
      val expect = com.google.common.hash.Hashing.murmur3_128().hashBytes(bytes).asBytes()
      assert(graft.dialect.BinFuncs.murmur3(bytes).sameElements(expect), s"len=$len")
    }
  }

  test("murmur3 is SQL-reachable over varbinary") {
    val hex = one("SELECT to_hex(murmur3(to_utf8('hello')))").asInstanceOf[String]
    val expect = com.google.common.hash.Hashing.murmur3_128()
      .hashBytes("hello".getBytes("UTF-8")).asBytes()
      .map(b => f"${b & 0xff}%02X").mkString
    assert(hex == expect)
  }

  test("inverse_binomial_cdf inverts binomial_cdf") {
    assert(one("SELECT inverse_binomial_cdf(20, 0.5, 0.5)") == 10)
    assert(one("SELECT try(inverse_binomial_cdf(20, 1.5, 0.5))") == null)
  }

  test("split_to_multimap keeps every value for repeated keys") {
    val m = one("SELECT split_to_multimap('a=1,b=2,a=3', ',', '=')")
      .asInstanceOf[Map[String, scala.collection.Seq[String]]]
    assert(m == Map("a" -> Seq("1", "3"), "b" -> Seq("2")))
    // kv delimiter must appear exactly once per entry, like Trino
    assert(one("SELECT try(split_to_multimap('a=1=2', ',', '='))") == null)
  }

  test("combinations emits n-element subsequences in index order, capped at 5") {
    assert(one("SELECT to_json(combinations(array(1,2,3), 2))")
      == "[[1,2],[1,3],[2,3]]")
    assert(one("SELECT to_json(combinations(array('a','b','c','d'), 3))")
      == """[["a","b","c"],["a","b","d"],["a","c","d"],["b","c","d"]]""")
    assert(one("SELECT to_json(combinations(array(1,2,3), 0))") == "[[]]")
    assert(one("SELECT to_json(combinations(array(1,2), 5))") == "[]")
    assert(one("SELECT try(combinations(array(1,2,3,4,5,6,7), 6))") == null)
  }

  test("tdigest_agg / values_at_quantiles / quantile_at_value round-trip") {
    // l_quantity is uniform on 1..50: the median sits near 25 and the
    // batch accessor must agree with repeated value_at_quantile reads
    val arr = one("""SELECT values_at_quantiles(tdigest_agg(CAST(l_quantity AS DOUBLE)),
                    array(0.1D, 0.5D, 0.9D)) FROM lineitem""")
      .asInstanceOf[scala.collection.Seq[Double]]
    assert(arr.length == 3 && arr(0) < arr(1) && arr(1) < arr(2))
    assert(arr(1) > 20 && arr(1) < 30)
    val rank = one("""SELECT quantile_at_value(qdigest_agg(CAST(l_quantity AS DOUBLE)), 25.0D)
                     FROM lineitem""").asInstanceOf[Double]
    assert(rank > 0.4 && rank < 0.6)
    // out-of-domain value → NULL like Trino
    assert(one("""SELECT quantile_at_value(qdigest_agg(CAST(l_quantity AS DOUBLE)), 1e9D)
                 FROM lineitem""") == null)
  }

  test("numeric_histogram respects the bucket budget and conserves weight") {
    val m = one("SELECT numeric_histogram(10, CAST(l_extendedprice AS DOUBLE)) FROM lineitem")
      .asInstanceOf[Map[Double, Double]]
    val n = spark.table("lineitem").count()
    assert(m.size <= 10 && m.size >= 2)
    assert(math.abs(m.values.sum - n) < 1e-6)
    val (lo, hi) = (m.keys.min, m.keys.max)
    val Array(exactLo, exactHi) = spark.sql(
      "SELECT MIN(l_extendedprice), MAX(l_extendedprice) FROM lineitem")
      .collect().head.toSeq.map(_.toString.toDouble).toArray
    assert(lo >= exactLo - 1e-6 && hi <= exactHi + 1e-6)
  }

  test("json_value extracts scalars with NULL ON EMPTY / NULL ON ERROR defaults") {
    assert(one("""SELECT json_value('{"a": {"b": 42}}', 'lax $.a.b')""") == "42")
    assert(one("""SELECT json_value('{"a": "x"}', 'strict $.a')""") == "x")
    assert(one("""SELECT json_value('{"a": [1, 2]}', '$.a')""") == null)   // non-scalar
    assert(one("""SELECT json_value('{"a": null}', '$.a')""") == null)     // JSON null
    assert(one("""SELECT json_value('{"a": 1}', '$.missing')""") == null)  // empty
    assert(one("""SELECT json_value('not json', '$.a')""") == null)        // error
  }

  test("json_query re-serializes the matched item; json_exists tests the path") {
    assert(one("""SELECT json_query('{"a": {"b": [1, 2]}}', 'lax $.a')""") == """{"b":[1,2]}""")
    assert(one("""SELECT json_query('{"a": [1, 2]}', '$.a[1]')""") == "2")
    assert(one("""SELECT json_query('{"a": 1}', '$.b')""") == null)
    assert(one("""SELECT json_exists('{"a": {"b": 1}}', 'lax $.a.b')""") == true)
    assert(one("""SELECT json_exists('{"a": 1}', '$.b')""") == false)
    assert(one("""SELECT json_exists('not json', '$.a')""") == false)      // FALSE ON ERROR
  }

  test("array_histogram counts distinct elements, ignoring nulls") {
    val m = one("SELECT array_histogram(array('a', 'b', 'a', NULL, 'a'))")
      .asInstanceOf[Map[String, Long]]
    assert(m == Map("a" -> 3L, "b" -> 1L))
    assert(one("SELECT array_histogram(CAST(array(NULL) AS ARRAY<INT>))")
      .asInstanceOf[Map[Int, Long]].isEmpty)
  }

  test("map predicate family composes exists/forall over keys and values") {
    assert(one("SELECT any_keys_match(map('a', 1, 'bb', 2), k -> length(k) = 2)") == true)
    assert(one("SELECT all_keys_match(map('a', 1, 'bb', 2), k -> length(k) = 2)") == false)
    assert(one("SELECT no_keys_match(map('a', 1), k -> k = 'z')") == true)
    assert(one("SELECT any_values_match(map('a', 1, 'b', 2), v -> v > 1)") == true)
    assert(one("SELECT all_values_match(map('a', 1, 'b', 2), v -> v > 0)") == true)
    assert(one("SELECT all_values_match(map('a', 1, 'b', 2), v -> v > 1)") == false)
    assert(one("SELECT no_values_match(map('a', 1, 'b', 2), v -> v > 5)") == true)
  }

  test("to_char / to_date / to_timestamp use Teradata tokens, case-insensitive") {
    assert(one("SELECT to_char(TIMESTAMP '2020-02-03 14:05:06', 'yyyy/mm/dd hh24:mi:ss')")
      == "2020/02/03 14:05:06")
    assert(one("SELECT to_char(TIMESTAMP '2020-02-03 14:05:06', 'YYYY-MM-DD')") == "2020-02-03")
    assert(one("SELECT CAST(to_date('2020/02/03', 'yyyy/mm/dd') AS STRING)") == "2020-02-03")
    assert(one("SELECT CAST(to_timestamp('03.02.2020 14:05:06', 'dd.mm.yyyy hh24:mi:ss') AS STRING)")
      == "2020-02-03 14:05:06")
    // 1-arg forms keep Spark's cast semantics
    assert(one("SELECT CAST(to_date('2020-02-03') AS STRING)") == "2020-02-03")
    assert(one("SELECT CAST(to_timestamp('2020-02-03 14:05:06') AS STRING)")
      == "2020-02-03 14:05:06")
    // a JVM/MySQL pattern is rejected rather than silently misread
    assert(qs.execute("SELECT to_date('2020-02-03', 'EEE MMM dd')").isLeft)
  }

  test("json_extract returns the matched item as JSON text") {
    assert(one("""SELECT json_extract('{"a": {"b": [1, 2]}}', '$.a')""") == """{"b":[1,2]}""")
    assert(one("""SELECT json_extract('{"a": [1, 2]}', '$.a[0]')""") == "1")
    assert(one("""SELECT json_extract('{"a": 1}', '$.b')""") == null)
  }

  test("luhn_check validates the mod-10 checksum") {
    assert(one("SELECT luhn_check('79927398713')") == true)
    assert(one("SELECT luhn_check('79927398714')") == false)
    assert(one("SELECT luhn_check('4242424242424242')") == true)
    assert(one("SELECT luhn_check('not-digits')") == false)
    assert(one("SELECT luhn_check(CAST(NULL AS STRING))") == null)
  }

  test("jaccard_index estimates |A∩B| / |A∪B| over set digests") {
    // A = 0..999, B = 500..1499 → true J = 500/1500 = 1/3
    val j = one(
      """SELECT jaccard_index(a, b) FROM
        |  (SELECT make_set_digest(x) AS a FROM range(0, 1000) AS t(x)),
        |  (SELECT make_set_digest(x) AS b FROM range(500, 1500) AS t(x))""".stripMargin)
      .asInstanceOf[Double]
    assert(math.abs(j - 1.0 / 3.0) < 0.05, s"jaccard $j")
    assert(one("SELECT jaccard_index(make_set_digest(x), make_set_digest(x)) " +
      "FROM (VALUES 1, 2, 3) AS t(x)") == 1.0)
  }

  test("repeat builds an n-element array on the guarded surface (Trino semantics)") {
    assert(one("SELECT repeat('x', 3)").asInstanceOf[scala.collection.Seq[String]]
      .toSeq == Seq("x", "x", "x"))
    assert(one("SELECT repeat(1, 0)").asInstanceOf[scala.collection.Seq[Int]].isEmpty)
    // array_repeat and the masked regions stay untouched
    assert(one("SELECT array_repeat('y', 2)").asInstanceOf[scala.collection.Seq[String]]
      .toSeq == Seq("y", "y"))
    assert(one("SELECT 'repeat(a, 2)'") == "repeat(a, 2)")
    assert(qs.execute("SELECT repeat('x', 10001)").isLeft) // Trino's cap
  }

  test("ip_prefix / ip_subnet_min / ip_subnet_max / ip_subnet_range canonicalize networks") {
    assert(one("SELECT ip_prefix('192.168.255.255', 9)") == "192.128.0.0/9")
    assert(one("SELECT ip_prefix('2001:0db8:85a3:0001:0001:8a2e:0370:7334', 48)")
      == "2001:db8:85a3::/48")
    assert(one("SELECT ip_subnet_min('192.168.0.0/24')") == "192.168.0.0")
    assert(one("SELECT ip_subnet_max('192.168.0.0/24')") == "192.168.0.255")
    assert(one("SELECT ip_subnet_min('2001:db8::/48')") == "2001:db8::")
    assert(one("SELECT ip_subnet_max('2001:db8::/48')")
      == "2001:db8:0:ffff:ffff:ffff:ffff:ffff")
    assert(one("SELECT ip_subnet_range('10.1.2.3/8')")
      .asInstanceOf[scala.collection.Seq[String]].toSeq
      == Seq("10.0.0.0", "10.255.255.255"))
    // malformed input raises (NULL under try)
    assert(one("SELECT try(ip_subnet_min('not-an-ip/8'))") == null)
    assert(one("SELECT try(ip_prefix('10.0.0.1', 33))") == null)
  }

  test("is_subnet_of covers address membership and prefix containment") {
    assert(one("SELECT is_subnet_of('192.168.0.0/24', '192.168.0.1')") == true)
    assert(one("SELECT is_subnet_of('192.168.0.0/24', '192.169.0.1')") == false)
    assert(one("SELECT is_subnet_of('192.168.0.0/24', '192.168.0.128/25')") == true)
    assert(one("SELECT is_subnet_of('192.168.0.128/25', '192.168.0.0/24')") == false)
    assert(one("SELECT is_subnet_of('2001:db8::/32', '2001:db8:1::1')") == true)
    // cross-family arguments raise like Trino
    assert(one("SELECT try(is_subnet_of('192.168.0.0/24', '2001:db8::1'))") == null)
  }

  test("is_private flags non-globally-reachable addresses") {
    assert(one("SELECT is_private('10.1.2.3')") == true)
    assert(one("SELECT is_private('192.168.1.1')") == true)
    assert(one("SELECT is_private('172.16.0.1')") == true)
    assert(one("SELECT is_private('127.0.0.1')") == true)
    assert(one("SELECT is_private('8.8.8.8')") == false)
    assert(one("SELECT is_private('157.240.200.99')") == false)
    assert(one("SELECT is_private('fe80::1')") == true)
    assert(one("SELECT is_private('2a03:2880:f031:12::2')") == false)
  }

  test("typeof renders Trino type names; version identifies the engine") {
    assert(one("SELECT typeof(1)") == "integer")
    assert(one("SELECT typeof('x')") == "varchar")
    assert(one("SELECT typeof(CAST(1.5 AS DECIMAL(4,2)))") == "decimal(4,2)")
    assert(one("SELECT typeof(array(1.0))") == "array(decimal(2,1))")
    assert(one("SELECT typeof(TIMESTAMP '2020-01-01 00:00:00')") == "timestamp(6)")
    assert(one("SELECT version()").asInstanceOf[String].startsWith("graft-spark "))
  }

  test("regexp_replace 2-arg deletes matches; 3-arg is Spark-identical") {
    assert(one("SELECT regexp_replace('1a2b3c', '[a-z]')") == "123")
    assert(one("SELECT regexp_replace('1a2b3c', '[a-z]', '_')") == "1_2_3_")
    assert(one("SELECT regexp_replace(CAST(NULL AS STRING), 'x')") == null)
  }

  test("row-limiting fuzz: OFFSET/FETCH equals LIMIT OFFSET on random bounds") {
    val rnd = new scala.util.Random(13)
    (1 to 25).foreach { _ =>
      val off = rnd.nextInt(30)
      val cnt = 1 + rnd.nextInt(10)
      def keys(sql: String): Seq[Any] =
        qs.execute(sql).fold(e => fail(s"$sql -> $e"), _.rows.map(_.head))
      val ansi = keys(s"SELECT n_nationkey FROM nation ORDER BY n_nationkey " +
        s"OFFSET $off ROWS FETCH NEXT $cnt ROWS ONLY")
      val spark = keys(s"SELECT n_nationkey FROM nation ORDER BY n_nationkey " +
        s"LIMIT $cnt OFFSET $off")
      assert(ansi == spark, s"off=$off cnt=$cnt")
    }
  }

  test("array_cum_sum: running sums with Trino's null and type rules") {
    def arr(sql: String): Seq[Any] =
      one(sql).asInstanceOf[scala.collection.Seq[Any]].toSeq
    assert(arr("SELECT array_cum_sum(array(1, 2, 3))") == Seq(1, 3, 6))
    assert(arr("SELECT array_cum_sum(array(CAST(1 AS BIGINT), 2, 3))")
      == Seq(1L, 3L, 6L))
    assert(arr("SELECT array_cum_sum(array(1.5D, 2.5D))") == Seq(1.5, 4.0))
    // decimal keeps its scale, widened precision
    assert(arr("SELECT array_cum_sum(array(DECIMAL '1.10', DECIMAL '2.20'))")
      .map(_.toString) == Seq("1.10", "3.30"))
    // positions at and after a NULL are NULL (not skipped)
    assert(arr("SELECT array_cum_sum(array(1, CAST(NULL AS INT), 3))")
      == Seq(1, null, null))
    // integral overflow raises (NULL under try())
    assert(one("SELECT try(array_cum_sum(array(2147483647, 1)))") == null)
  }

  test("to_base32 / from_base32: RFC 4648 round-trip") {
    // RFC 4648 test vector: 'hello' (5 bytes, no padding)
    assert(one("SELECT to_base32(to_utf8('hello'))") == "NBSWY3DP")
    assert(one("SELECT from_utf8(from_base32('NBSWY3DP'))") == "hello")
    // padded lengths round-trip; lowercase accepted on decode
    assert(one("SELECT from_utf8(from_base32(to_base32(to_utf8('hello world!!'))))")
      == "hello world!!")
    assert(one("SELECT to_base32(to_utf8('f'))") == "MY======")
    assert(one("SELECT from_utf8(from_base32('my======'))") == "f")
    assert(one("SELECT to_base32(to_utf8(''))") == "")
    // invalid characters raise (NULL under try())
    assert(one("SELECT try(from_base32('1@#'))") == null)
    // strict canonical form like Trino's Guava codec (r13 ADVICE):
    // non-multiple-of-8 length, a padding count Guava never emits,
    // and nonzero trailing bits all raise (NULL under try())
    assert(one("SELECT try(from_base32('A'))") == null)         // length 1
    assert(one("SELECT try(from_base32('NBSWY3D'))") == null)   // length 7
    assert(one("SELECT try(from_base32('MY====='))") == null)   // 5 pads
    assert(one("SELECT try(from_base32('M======='))") == null)  // 7 pads
    assert(one("SELECT try(from_base32('MZ======'))") == null)  // trailing bits
    assert(one("SELECT from_utf8(from_base32('MY======'))") == "f")
  }

  test("UNNEST of a 2-field row array splats via the type-aware retry") {
    // one argument + two aliases is textually a MAP unnest; the
    // default explode() reading fails analysis on an ARRAY(ROW(a, b))
    // and QueryService retries the inline() reading — Trino's
    // row-splat now RUNS instead of erroring (r14 VERDICT item 2)
    val r = qs.execute(
      """SELECT u.x, u.y
        |FROM (SELECT array(CAST(ROW(1, 2) AS ROW(a int, b int))) AS arr) t
        |CROSS JOIN UNNEST(t.arr) AS u(x, y)""".stripMargin)
    assert(r.fold(e => fail(e), _.rows.map(_.toSeq)) == Seq(Seq(1, 2)), r)
    // the MAP reading still wins first (no retry, explode succeeds)
    val m = qs.execute(
      "SELECT k, v FROM UNNEST(map('a', 1)) AS t(k, v)")
    assert(m.fold(e => fail(e), _.rows.map(_.toSeq)) == Seq(Seq("a", 1)))
    // a shape NEITHER reading accepts (3-field rows, 2 aliases) still
    // fails, and the message names both readings
    val e = qs.execute(
      """SELECT u.x, u.y
        |FROM (SELECT array(CAST(ROW(1, 2, 3) AS ROW(a int, b int, c int)))
        |  AS arr) t
        |CROSS JOIN UNNEST(t.arr) AS u(x, y)""".stripMargin)
    assert(e.isLeft, e)
    assert(e.left.exists(_.contains("both readings")), e)
  }

  test("spooky_hash_v2_32/64 match Trino's published vectors") {
    // authoritative vectors (Trino TestVarbinaryFunctions): the empty
    // string and 'hello' — two exact 64-bit agreements pin the
    // transcription of the public-domain SpookyV2 algorithm; the
    // 32-bit form is the low word, emitted big-endian
    assert(one("SELECT to_hex(spooky_hash_v2_64(CAST('' AS VARBINARY)))")
      == "232706FC6BF50919")
    assert(one("SELECT to_hex(spooky_hash_v2_32(CAST('' AS VARBINARY)))")
      == "6BF50919")
    assert(one("SELECT to_hex(spooky_hash_v2_64(to_utf8('hello')))")
      == "3768826AD382E6CA")
    assert(one("SELECT to_hex(spooky_hash_v2_32(to_utf8('hello')))")
      == "D382E6CA")
    // NULL propagates
    assert(one("SELECT spooky_hash_v2_64(CAST(NULL AS VARBINARY))") == null)
  }

  test("spooky hash regression pins across every internal path") {
    // computed-once pins (deterministic tabulated input) covering the
    // byte-tail switch (11B), ShortMix (16..191B) and the 12-lane long
    // path (>=192B, exact block boundary and tails) — a change in any
    // rotation constant or tail case moves at least one of these
    def spooky(n: Int): String = {
      val d = Array.tabulate(n)(i => ((i * 131 + 7) & 0xff).toByte)
      graft.dialect.BinFuncs.spookyHashV264(d).map(b => f"$b%02X").mkString
    }
    assert(one("SELECT to_hex(spooky_hash_v2_64(to_utf8('hello world')))")
      == "CE4E98819BFF125D")
    assert(spooky(16) == "20E6E04F54401CFC")
    assert(spooky(31) == "39996B108AD92102")
    assert(spooky(100) == "1CAFEEE771744B11")
    assert(spooky(191) == "4EDBFFF25A346108")
    assert(spooky(192) == "8918BA2EEBEBFDE9")
    assert(spooky(200) == "29284E3D4F37AF39")
    assert(spooky(960) == "6CD53935BE11A745")
  }

  test("bar() renders the ANSI red-to-green ramp with padding") {
    val s = one("SELECT bar(0.75, 8)").asInstanceOf[String]
    // 6 full blocks, each color-prefixed, then reset + 2 pad spaces
    assert(s.count(_ == '\u2588') == 6, s)
    assert(s.startsWith("\u001b[38;5;196m\u2588"), s)  // pure red first
    assert(s.endsWith("\u001b[0m  "), s)
    // clamping: <=0 renders no blocks, >=1 renders width blocks
    val empty = one("SELECT bar(-0.5, 3)").asInstanceOf[String]
    assert(empty.count(_ == '\u2588') == 0 && empty.endsWith("   "))
    val full = one("SELECT bar(2.0, 3)").asInstanceOf[String]
    assert(full.count(_ == '\u2588') == 3)
    // width bounds are enforced
    val e = qs.execute("SELECT bar(0.5, 0)")
    assert(e.isLeft && e.left.exists(_.contains("width")), e)
    // COLOR-typed 4-arg form is a curated reject
    val e4 = qs.execute("SELECT bar(0.5, 10, 1, 2)")
    assert(e4.isLeft && e4.left.exists(_.contains("COLOR")), e4)
  }

  test("json_query wrapper and quote clauses") {
    // WITH [UNCONDITIONAL] ARRAY WRAPPER always wraps
    assert(one("""SELECT json_query('{"a": [1, 2]}', 'lax $.a' WITH ARRAY WRAPPER)""")
      == "[[1,2]]")
    assert(one("""SELECT json_query('{"a": [1, 2]}', '$.a' WITH UNCONDITIONAL ARRAY WRAPPER)""")
      == "[[1,2]]")
    // CONDITIONAL wraps only non-container matches
    assert(one("""SELECT json_query('{"a": [1, 2]}', '$.a' WITH CONDITIONAL ARRAY WRAPPER)""")
      == "[1,2]")
    assert(one("""SELECT json_query('{"a": [1, 2]}', '$.a[0]' WITH CONDITIONAL ARRAY WRAPPER)""")
      == "[1]")
    // WITHOUT WRAPPER is the existing default, spelled explicitly
    assert(one("""SELECT json_query('{"a": [1, 2]}', '$.a' WITHOUT ARRAY WRAPPER)""")
      == "[1,2]")
    // quotes: KEEP is the default serialization, OMIT strips them on
    // a scalar string (and only there)
    assert(one("""SELECT json_query('{"s": "x y"}', '$.s' KEEP QUOTES)""")
      == "\"x y\"")
    assert(one("""SELECT json_query('{"s": "x y"}', '$.s' OMIT QUOTES)""")
      == "x y")
    assert(one("""SELECT json_query('{"s": "x"}', '$.s' OMIT QUOTES ON SCALAR STRING)""")
      == "x")
    assert(one("""SELECT json_query('{"a": [1]}', '$.a' OMIT QUOTES)""")
      == "[1]")
    // SQL/JSON rule: OMIT QUOTES under a wrapper is rejected
    val e = qs.execute(
      """SELECT json_query('{"s": "x"}', '$.s' WITH ARRAY WRAPPER OMIT QUOTES)""")
    assert(e.isLeft && e.left.exists(_.contains("OMIT QUOTES")), e)
    // a genuinely unknown trailing clause is still a curated reject
    val e2 = qs.execute(
      """SELECT json_query('{}', '$.a' WITH ARRAY WRAPPER FROBNICATE)""")
    assert(e2.isLeft && e2.left.exists(_.contains("trailing clause")), e2)
    // clause keywords inside the PATH literal are data
    assert(one("""SELECT json_query('{"WITH ARRAY WRAPPER": 1}', '$["WITH ARRAY WRAPPER"]')""")
      == "1")
  }

  test("json_value ON EMPTY / ON ERROR behaviors") {
    // NULL spelled explicitly is the default
    assert(one("""SELECT json_value('{"b": 1}', 'lax $.a' NULL ON EMPTY)""") == null)
    // DEFAULT expr on a structural miss (EMPTY class)
    assert(one("""SELECT json_value('{"b": 1}', 'lax $.a' DEFAULT 'missing' ON EMPTY)""")
      == "missing")
    // ...but a present match ignores the clause
    assert(one("""SELECT json_value('{"a": 7}', 'lax $.a' DEFAULT 'missing' ON EMPTY)""")
      == "7")
    // ERROR ON EMPTY raises with the behavior named
    val e1 = qs.execute("""SELECT json_value('{"b": 1}', 'lax $.a' ERROR ON EMPTY)""")
    assert(e1.isLeft && e1.left.exists(_.contains("ERROR ON EMPTY")), e1)
    // ERROR class: malformed JSON input and a non-scalar match
    assert(one("""SELECT json_value('{oops', '$.a' DEFAULT 'bad' ON ERROR)""") == "bad")
    assert(one("""SELECT json_value('{"a": [1, 2]}', '$.a' DEFAULT 'ns' ON ERROR)""") == "ns")
    val e2 = qs.execute("""SELECT json_value('{"a": [1]}', '$.a' ERROR ON ERROR)""")
    assert(e2.isLeft && e2.left.exists(_.contains("non-scalar")), e2)
    // both clauses: each triggers only on its own class
    assert(one("""SELECT json_value('{"b": 1}', '$.a' DEFAULT 'e1' ON EMPTY DEFAULT 'e2' ON ERROR)""")
      == "e1")
    assert(one("""SELECT json_value('{"a": [1]}', '$.a' DEFAULT 'e1' ON EMPTY DEFAULT 'e2' ON ERROR)""")
      == "e2")
    // a matched JSON null is a present scalar: SQL NULL, no clause fires
    assert(one("""SELECT json_value('{"a": null}', '$.a' DEFAULT 'e' ON EMPTY ERROR ON ERROR)""")
      == null)
    // DEFAULT NULL is a DEFAULT whose expression is the NULL literal
    assert(one("""SELECT json_value('{"b": 1}', '$.a' DEFAULT NULL ON EMPTY)""") == null)
    // composes with RETURNING (clause order: RETURNING first, per Trino)
    assert(one("""SELECT json_value('{"b": 1}', '$.a' RETURNING bigint DEFAULT 0 ON EMPTY) + 1""")
      == 1L)
    // NULL input → NULL out; behaviors don't fire on SQL NULL json
    assert(one("""SELECT json_value(CAST(NULL AS VARCHAR), '$.a' DEFAULT 'd' ON ERROR)""")
      == null)
    // duplicate clause rejected
    val e3 = qs.execute("""SELECT json_value('{}', '$.a' NULL ON EMPTY NULL ON EMPTY)""")
    assert(e3.isLeft && e3.left.exists(_.contains("duplicate")), e3)
    // clause keywords inside a string literal are data, not clauses
    assert(one("""SELECT json_value('{"a": "x"}', '$.a' DEFAULT 'NULL ON EMPTY' ON EMPTY)""")
      == "x")
  }

  test("json_query ON EMPTY / ON ERROR behaviors") {
    // EMPTY class: the path matched nothing
    assert(one("""SELECT json_query('{"b": 1}', '$.a' EMPTY ARRAY ON EMPTY)""") == "[]")
    assert(one("""SELECT json_query('{"b": 1}', '$.a' EMPTY OBJECT ON EMPTY)""") == "{}")
    assert(one("""SELECT json_query('{"b": 1}', '$.a' NULL ON EMPTY)""") == null)
    val e1 = qs.execute("""SELECT json_query('{"b": 1}', '$.a' ERROR ON EMPTY)""")
    assert(e1.isLeft && e1.left.exists(_.contains("ERROR ON EMPTY")), e1)
    // ERROR class: malformed JSON input
    assert(one("""SELECT json_query('{oops', '$.a' EMPTY ARRAY ON ERROR)""") == "[]")
    val e2 = qs.execute("""SELECT json_query('{oops', '$.a' ERROR ON ERROR)""")
    assert(e2.isLeft && e2.left.exists(_.contains("malformed")), e2)
    // composes with the wrapper clauses; a present match ignores both
    assert(one(
      """SELECT json_query('{"a": 1}', '$.a' WITH ARRAY WRAPPER EMPTY OBJECT ON EMPTY)""")
      == "[1]")
    assert(one("""SELECT json_query('{}', '$.a' WITH ARRAY WRAPPER NULL ON ERROR)""")
      == null)
    // duplicates rejected
    val e3 = qs.execute(
      """SELECT json_query('{}', '$.a' EMPTY ARRAY ON EMPTY NULL ON EMPTY)""")
    assert(e3.isLeft && e3.left.exists(_.contains("duplicate")), e3)
    // RETURNING composes: alone, and through the clause splice
    assert(one("""SELECT json_query('{"a": [1]}', '$.a' RETURNING varchar)""")
      == "[1]")
    assert(one(
      """SELECT json_query('{"a": 1}', '$.a' RETURNING varchar WITH ARRAY WRAPPER)""")
      == "[1]")
    assert(one(
      """SELECT json_query('{"b": 1}', '$.a' RETURNING varchar EMPTY ARRAY ON EMPTY)""")
      == "[]")
  }

  test("json_object / json_array constructors") {
    // KEY … VALUE and colon forms; NULL ON NULL is json_object's default
    assert(one("""SELECT json_object(KEY 'a' VALUE 1, KEY 'b' VALUE 'x')""")
      == """{"a":1,"b":"x"}""")
    assert(one("""SELECT json_object('a' VALUE 1, 'b' VALUE NULL)""")
      == """{"a":1,"b":null}""")
    assert(one("""SELECT json_object('a' VALUE 1, 'b' VALUE NULL ABSENT ON NULL)""")
      == """{"a":1}""")
    assert(one("""SELECT json_object('a' : 5)""") == """{"a":5}""")
    assert(one("SELECT json_object()") == "{}")
    // json_array: mixed element types; ABSENT ON NULL is its default
    assert(one("""SELECT json_array(1, 'two', 3.5)""") == """[1,"two",3.5]""")
    assert(one("SELECT json_array(1, NULL, 2)") == "[1,2]")
    assert(one("SELECT json_array(1, NULL, 2 NULL ON NULL)") == "[1,null,2]")
    assert(one("SELECT json_array()") == "[]")
    // nested constructors and json_parse members EMBED (not quote)
    assert(one("""SELECT json_array(1, json_object('k' VALUE 2))""")
      == """[1,{"k":2}]""")
    assert(one(
      """SELECT json_object('o' VALUE json_array(1, 2), 'p' VALUE json_parse('{"z": true}'))""")
      == """{"o":[1,2],"p":{"z":true}}""")
    // RETURNING; a nested json_value RETURNING member is not stolen
    assert(one("""SELECT json_object('a' VALUE 1 RETURNING varchar)""")
      == """{"a":1}""")
    assert(one("""SELECT json_array(json_value('{"k": 7}', 'lax $.k' RETURNING bigint))""")
      == "[7]")
    // WITH UNIQUE KEYS rejects literal duplicates; without it, last wins
    val e1 = qs.execute("""SELECT json_object('a' VALUE 1, 'a' VALUE 2 WITH UNIQUE KEYS)""")
    assert(e1.isLeft && e1.left.exists(_.contains("duplicate key")), e1)
    assert(one("""SELECT json_object('a' VALUE 1, 'a' VALUE 2)""") == """{"a":2}""")
    // clause keywords inside string members are data
    assert(one("""SELECT json_array('NULL ON NULL')""") == """["NULL ON NULL"]""")
  }

  test("json_object: dynamic (non-literal) keys") {
    // column / expression keys, KEY prefix and colon forms, mixed
    // with literal keys in one constructor
    assert(one(
      """SELECT json_object(r_name VALUE r_regionkey) FROM region
        |WHERE r_regionkey = 0""".stripMargin) == """{"AFRICA":0}""")
    assert(one("""SELECT json_object(lower('AB') VALUE 1)""") == """{"ab":1}""")
    assert(one("""SELECT json_object(upper('k') : 2, 'fixed' VALUE 9)""")
      == """{"K":2,"fixed":9}""")
    // nested-constructor members embed; ABSENT ON NULL drops; the
    // default NULL ON NULL keeps
    assert(one(
      """SELECT json_object(KEY 'a' || 'b' VALUE json_array(1, 2),
        |  concat('c', 'd') : CAST(NULL AS INT) ABSENT ON NULL)""".stripMargin)
      == """{"ab":[1,2]}""")
    assert(one("""SELECT json_object(lower('A') VALUE CAST(NULL AS INT))""")
      == """{"a":null}""")
    // RETURNING rides through the dynamic carrier
    assert(one("""SELECT json_object(lower('A') VALUE 1 RETURNING varchar)""")
      == """{"a":1}""")
    // a NULL key raises like Trino; WITH UNIQUE KEYS checks at
    // runtime; duplicates without it collapse last-wins (the same
    // documented latitude as the literal path)
    val e1 = qs.execute("SELECT json_object(CAST(NULL AS VARCHAR) VALUE 1)")
    assert(e1.isLeft && e1.left.exists(_.contains("NULL key")), e1)
    val e2 = qs.execute(
      "SELECT json_object(lower('A') VALUE 1, 'a' VALUE 2 WITH UNIQUE KEYS)")
    assert(e2.isLeft && e2.left.exists(_.contains("duplicate key")), e2)
    assert(one("""SELECT json_object(lower('A') VALUE 1, 'a' VALUE 2)""")
      == """{"a":2}""")
    // a comma before the null clause is a Trino syntax error too —
    // curated reject with the drop-the-comma hint
    val e3 = qs.execute("SELECT json_array(1, NULL ON NULL)")
    assert(e3.isLeft && e3.left.exists(_.contains("without a comma")), e3)
  }

  test("JSON_TABLE: SQL:2016 table function over chained laterals") {
    def rows(sql: String): Seq[Seq[Any]] =
      qs.execute(sql).fold(e => throw new AssertionError(s"$sql -> $e"), _.rows)
    // constant row source, value column with explicit PATH
    assert(rows(
      """SELECT jt.v FROM JSON_TABLE('[1,2,3]', '$[*]' COLUMNS(v bigint PATH '$')) jt ORDER BY v""")
      .map(_.head) == Seq(1L, 2L, 3L))
    // correlated source + ordinality + implicit path + missing member
    val r = rows(
      """SELECT s.id, jt.ord, jt.a, jt.b FROM (
        |  SELECT 1 AS id, '{"items": [{"a": 10, "b": "x"}, {"a": 20}]}' AS j
        |) s, JSON_TABLE(j, 'lax $.items[*]' COLUMNS(
        |  ord FOR ORDINALITY, a bigint, b varchar PATH '$.b')) jt
        |ORDER BY ord""".stripMargin)
    assert(r == Seq(Seq(1, 1, 10L, "x"), Seq(1, 2, 20L, null)), r)
    // column behaviors ride through; FORMAT JSON takes the item
    assert(rows(
      """SELECT jt.b, jt.whole FROM JSON_TABLE('[{"a": 1}]', '$[*]' COLUMNS(
        |  b varchar PATH '$.b' DEFAULT 'none' ON EMPTY,
        |  whole varchar FORMAT JSON PATH '$')) jt""".stripMargin)
      == Seq(Seq("none", """{"a":1}""")))
    // EXISTS column
    assert(rows(
      """SELECT jt.has_a FROM JSON_TABLE('[{"a": 1}, {}]', '$[*]' COLUMNS(
        |  has_a boolean EXISTS PATH '$.a')) jt ORDER BY has_a""".stripMargin)
      .map(_.head) == Seq(false, true))
    // empty row set = no rows; EMPTY ON ERROR = empty table on bad input
    assert(rows(
      """SELECT jt.v FROM JSON_TABLE('[]', '$[*]' COLUMNS(v bigint PATH '$')) jt""")
      .isEmpty)
    assert(rows(
      """SELECT jt.v FROM JSON_TABLE('{oops', '$[*]' COLUMNS(v bigint PATH '$') EMPTY ON ERROR) jt""")
      .isEmpty)
    // default is ERROR ON ERROR — malformed input raises
    val e1 = qs.execute(
      """SELECT jt.v FROM JSON_TABLE('{oops', '$[*]' COLUMNS(v bigint PATH '$')) jt""")
    assert(e1.isLeft, e1)
    // PLAN rejects loudly; malformed NESTED rejects with the grammar
    val e3 = qs.execute(
      """SELECT 1 FROM JSON_TABLE('[]', '$[*]' COLUMNS(v bigint PATH '$') PLAN (x OUTER)) jt""")
    assert(e3.isLeft && e3.left.exists(_.contains("PLAN")), e3)
    val e4 = qs.execute(
      """SELECT 1 FROM JSON_TABLE('[]', '$[*]' COLUMNS(NESTED COLUMNS(y bigint))) jt""")
    assert(e4.isLeft && e4.left.exists(_.contains("NESTED")), e4)
    // two JSON_TABLEs compose in one FROM
    assert(rows(
      """SELECT x.v, y.v FROM JSON_TABLE('[1]', '$[*]' COLUMNS(v bigint PATH '$')) x,
        |JSON_TABLE('[7,8]', '$[*]' COLUMNS(v bigint PATH '$')) y ORDER BY y.v""".stripMargin)
      == Seq(Seq(1L, 7L), Seq(1L, 8L)))
  }

  test("JSON_TABLE NESTED PATH: SQL:2016 default plan (OUTER, UNION)") {
    def rows(sql: String): Seq[Seq[Any]] =
      qs.execute(sql).fold(e => throw new AssertionError(s"$sql -> $e"), _.rows)
    // one nested branch: parent OUTER child — empty/missing child set
    // keeps the parent row with NULL nested columns
    assert(rows(
      """SELECT jt.id, jt.v FROM JSON_TABLE(
        |  '[{"id": 1, "xs": [10, 11]}, {"id": 2, "xs": []}, {"id": 3}]',
        |  '$[*]' COLUMNS(
        |    id bigint PATH '$.id',
        |    NESTED PATH '$.xs[*]' COLUMNS(v bigint PATH '$'))) jt
        |ORDER BY id, v NULLS LAST""".stripMargin)
      == Seq(Seq(1L, 10L), Seq(1L, 11L), Seq(2L, null), Seq(3L, null)))
    // sibling branches UNION: each side's rows carry NULL for the
    // other's columns; both-empty still yields ONE outer row; a
    // non-empty sibling suppresses the outer all-NULL row
    assert(rows(
      """SELECT jt.id, jt.x, jt.y FROM JSON_TABLE(
        |  '[{"id": 1, "xs": [10], "ys": ["a", "b"]}, {"id": 2, "ys": ["c"]}, {"id": 3}]',
        |  '$[*]' COLUMNS(
        |    id bigint PATH '$.id',
        |    NESTED PATH '$.xs[*]' COLUMNS(x bigint PATH '$'),
        |    NESTED PATH '$.ys[*]' AS ys COLUMNS(y varchar PATH '$'))) jt
        |ORDER BY id, x NULLS LAST, y NULLS LAST""".stripMargin)
      == Seq(Seq(1L, 10L, null), Seq(1L, null, "a"), Seq(1L, null, "b"),
        Seq(2L, null, "c"), Seq(3L, null, null)))
    // depth-2 nesting: grandchildren join OUTER under their own branch
    // only; the sibling branch's rows are untouched; nested ordinality
    // counts within the current parent item
    assert(rows(
      """SELECT jt.id, jt.v, jt.o, jt.g FROM JSON_TABLE(
        |  '[{"id": 1, "items": [{"v": 10, "gs": [100, 101]}, {"v": 11}]}]',
        |  '$[*]' COLUMNS(
        |    id bigint PATH '$.id',
        |    NESTED PATH '$.items[*]' COLUMNS(
        |      v bigint PATH '$.v',
        |      o FOR ORDINALITY,
        |      NESTED PATH '$.gs[*]' COLUMNS(g bigint PATH '$')))) jt
        |ORDER BY v, g NULLS LAST""".stripMargin)
      == Seq(Seq(1L, 10L, 1, 100L), Seq(1L, 10L, 1, 101L),
        Seq(1L, 11L, 2, null)))
    // behavior clauses + EXISTS ride into nested columns; table-level
    // EMPTY ON ERROR wraps nested row sources too
    assert(rows(
      """SELECT jt.a, jt.v, jt.e FROM JSON_TABLE(
        |  '[{"a": 5}, {"b": 2}]', '$[*]' COLUMNS(
        |    a bigint DEFAULT -1 ON EMPTY,
        |    NESTED PATH '$.b' COLUMNS(
        |      v bigint PATH '$',
        |      e boolean EXISTS PATH '$')) EMPTY ON ERROR) jt
        |ORDER BY a""".stripMargin)
      == Seq(Seq(-1L, 2L, true), Seq(5L, null, null)))
  }

  test("JSON_TABLE PLAN DEFAULT: INNER joins and the curated rejects") {
    def rows(sql: String): Seq[Seq[Any]] =
      qs.execute(sql).fold(e => throw new AssertionError(s"$sql -> $e"), _.rows)
    // INNER drops parents without child rows (empty or missing set)
    assert(rows(
      """SELECT jt.id, jt.v FROM JSON_TABLE(
        |  '[{"id": 1, "xs": [10, 11]}, {"id": 2, "xs": []}, {"id": 3}]',
        |  '$[*]' COLUMNS(id bigint PATH '$.id',
        |    NESTED PATH '$.xs[*]' COLUMNS(v bigint PATH '$'))
        |  PLAN DEFAULT (INNER)) jt ORDER BY id, v""".stripMargin)
      == Seq(Seq(1L, 10L), Seq(1L, 11L)))
    // INNER + sibling UNION: dropped only when the union is empty
    assert(rows(
      """SELECT jt.id, jt.x, jt.y FROM JSON_TABLE(
        |  '[{"id": 1, "xs": [10], "ys": ["a"]}, {"id": 2, "ys": ["c"]}, {"id": 3}]',
        |  '$[*]' COLUMNS(id bigint PATH '$.id',
        |    NESTED PATH '$.xs[*]' COLUMNS(x bigint PATH '$'),
        |    NESTED PATH '$.ys[*]' COLUMNS(y varchar PATH '$'))
        |  PLAN DEFAULT (INNER, UNION)) jt
        |ORDER BY id, x NULLS LAST, y NULLS LAST""".stripMargin)
      == Seq(Seq(1L, 10L, null), Seq(1L, null, "a"), Seq(2L, null, "c")))
    // depth-2 INNER: a child row without grandchildren is dropped,
    // but the sibling branch's rows survive (the passthrough marker)
    assert(rows(
      """SELECT jt.v, jt.g, jt.t FROM JSON_TABLE(
        |  '[{"items": [{"v": 10, "gs": [100]}, {"v": 11}], "tags": ["a"]}]',
        |  '$[*]' COLUMNS(
        |    NESTED PATH '$.items[*]' COLUMNS(v bigint PATH '$.v',
        |      NESTED PATH '$.gs[*]' COLUMNS(g bigint PATH '$')),
        |    NESTED PATH '$.tags[*]' COLUMNS(t varchar PATH '$'))
        |  PLAN DEFAULT (INNER)) jt
        |ORDER BY v NULLS LAST, g NULLS LAST, t NULLS LAST""".stripMargin)
      == Seq(Seq(10L, 100L, null), Seq(null, null, "a")))
    // explicit OUTER/UNION spelling = the default behavior
    assert(rows(
      """SELECT jt.id, jt.v FROM JSON_TABLE(
        |  '[{"id": 2, "xs": []}]', '$[*]' COLUMNS(id bigint PATH '$.id',
        |    NESTED PATH '$.xs[*]' COLUMNS(v bigint PATH '$'))
        |  PLAN DEFAULT (OUTER, UNION)) jt""".stripMargin)
      == Seq(Seq(2L, null)))
    // PLAN DEFAULT composes with the table-level ON ERROR clause
    assert(rows(
      """SELECT jt.v FROM JSON_TABLE('{oops', '$[*]' COLUMNS(v bigint PATH '$')
        |  PLAN DEFAULT (INNER) EMPTY ON ERROR) jt""".stripMargin).isEmpty)
    // per-node PLAN rejects loudly
    val e2 = qs.execute(
      "SELECT 1 FROM JSON_TABLE('[]', '$' COLUMNS(x int) PLAN (a OUTER b)) jt")
    assert(e2.isLeft && e2.left.exists(_.contains("PLAN DEFAULT")), e2)
  }

  test("JSON_TABLE PLAN DEFAULT (CROSS): sibling products") {
    def rows(sql: String): Seq[Seq[Any]] =
      qs.execute(sql).fold(e => throw new AssertionError(s"$sql -> $e"), _.rows)
    // OUTER CROSS: the sibling product per parent; ANY empty factor
    // empties the product — P OUTER {} keeps one all-NULL row
    assert(rows(
      """SELECT jt.id, jt.x, jt.o, jt.y FROM JSON_TABLE(
        |  '[{"id": 1, "xs": [10, 11], "ys": ["a", "b"]}, {"id": 2, "ys": ["c"]}, {"id": 3}]',
        |  '$[*]' COLUMNS(id bigint PATH '$.id',
        |    NESTED PATH '$.xs[*]' COLUMNS(x bigint PATH '$'),
        |    NESTED PATH '$.ys[*]' COLUMNS(o FOR ORDINALITY, y varchar PATH '$'))
        |  PLAN DEFAULT (OUTER, CROSS)) jt
        |ORDER BY id, x NULLS LAST, y NULLS LAST""".stripMargin)
      == Seq(Seq(1L, 10L, 1, "a"), Seq(1L, 10L, 2, "b"),
        Seq(1L, 11L, 1, "a"), Seq(1L, 11L, 2, "b"),
        Seq(2L, null, null, null), Seq(3L, null, null, null)))
    // INNER CROSS: any empty factor drops the parent
    assert(rows(
      """SELECT jt.id, jt.x, jt.y FROM JSON_TABLE(
        |  '[{"id": 1, "xs": [10], "ys": ["a", "b"]}, {"id": 2, "ys": ["c"]}, {"id": 3}]',
        |  '$[*]' COLUMNS(id bigint PATH '$.id',
        |    NESTED PATH '$.xs[*]' COLUMNS(x bigint PATH '$'),
        |    NESTED PATH '$.ys[*]' COLUMNS(y varchar PATH '$'))
        |  PLAN DEFAULT (INNER, CROSS)) jt
        |ORDER BY id, x NULLS LAST, y NULLS LAST""".stripMargin)
      == Seq(Seq(1L, 10L, "a"), Seq(1L, 10L, "b")))
    // three-way product in declaration order
    assert(rows(
      """SELECT jt.a, jt.b, jt.c FROM JSON_TABLE(
        |  '[{"as": [1, 2], "bs": [3], "cs": [4, 5]}]',
        |  '$[*]' COLUMNS(
        |    NESTED PATH '$.as[*]' COLUMNS(a bigint PATH '$'),
        |    NESTED PATH '$.bs[*]' COLUMNS(b bigint PATH '$'),
        |    NESTED PATH '$.cs[*]' COLUMNS(c bigint PATH '$'))
        |  PLAN DEFAULT (CROSS)) jt ORDER BY a, b, c""".stripMargin)
      == Seq(Seq(1L, 3L, 4L), Seq(1L, 3L, 5L), Seq(2L, 3L, 4L),
        Seq(2L, 3L, 5L)))
    // CROSS supports one nesting level only — deeper rejects loudly
    val e1 = qs.execute(
      """SELECT 1 FROM JSON_TABLE('[]', '$' COLUMNS(NESTED PATH '$.a[*]'
        |COLUMNS(v int PATH '$', NESTED PATH '$.g[*]' COLUMNS(g int PATH '$')))
        |PLAN DEFAULT (CROSS)) jt""".stripMargin)
    assert(e1.isLeft && e1.left.exists(_.contains("one nesting level")), e1)
  }

  test("preprocess is idempotent over the r15 SQL/JSON constructs") {
    // a rewrite whose OUTPUT re-triggers itself would corrupt text on
    // any path that preprocesses twice (EXPLAIN, the ambiguity retries)
    Seq(
      """SELECT json_value(j, '$.a' DEFAULT 'd' ON EMPTY ERROR ON ERROR) FROM t""",
      """SELECT json_query(j, '$.a' WITH ARRAY WRAPPER EMPTY OBJECT ON EMPTY) FROM t""",
      """SELECT json_exists(j, '$.a' UNKNOWN ON ERROR) FROM t""",
      """SELECT json_object(KEY 'a' VALUE x, 'b' : json_array(1, NULL NULL ON NULL) ABSENT ON NULL RETURNING varchar) FROM t""",
      """SELECT json_object(upper(k) : v, KEY k || '_x' VALUE json_array(v) WITH UNIQUE KEYS RETURNING varchar) FROM t""",
      """SELECT jt.o, jt.v FROM t, JSON_TABLE(j, 'lax $.items[*]' COLUMNS(
        |  o FOR ORDINALITY, v bigint PATH '$.v' DEFAULT 0 ON EMPTY,
        |  w varchar FORMAT JSON, e boolean EXISTS PATH '$.e') EMPTY ON ERROR) jt""".stripMargin,
      """SELECT jt.id, jt.v, jt.g, jt.y FROM t, JSON_TABLE(j, '$[*]' COLUMNS(
        |  id bigint PATH '$.id',
        |  NESTED PATH '$.items[*]' COLUMNS(
        |    v bigint PATH '$.v' DEFAULT 0 ON EMPTY,
        |    NESTED PATH '$.gs[*]' COLUMNS(g bigint PATH '$')),
        |  NESTED PATH '$.ys[*]' COLUMNS(y varchar PATH '$'))) jt""".stripMargin,
      """SELECT jt.v, jt.g FROM t, JSON_TABLE(j, '$[*]' COLUMNS(
        |  NESTED PATH '$.xs[*]' COLUMNS(v bigint PATH '$',
        |    NESTED PATH '$.g' COLUMNS(g bigint PATH '$')))
        |  PLAN DEFAULT (INNER) EMPTY ON ERROR) jt""".stripMargin,
      """SELECT jt.x, jt.y FROM t, JSON_TABLE(j, '$[*]' COLUMNS(
        |  NESTED PATH '$.xs[*]' COLUMNS(x bigint PATH '$'),
        |  NESTED PATH '$.ys[*]' COLUMNS(y bigint PATH '$'))
        |  PLAN DEFAULT (OUTER, CROSS)) jt""".stripMargin,
      """SELECT a FROM t ORDER BY 1 OFFSET 3 ROWS FETCH FIRST 5 ROWS WITH TIES"""
    ).foreach { s =>
      val once = graft.dialect.TrinoFunctions.preprocess(s)
      val twice = graft.dialect.TrinoFunctions.preprocess(once)
      assert(once == twice, s"\n$s\n-- once:\n$once\n-- twice:\n$twice")
    }
  }

  test("json_exists ON ERROR behaviors") {
    // present / absent paths are plain TRUE / FALSE regardless of clause
    assert(one("""SELECT json_exists('{"a": 1}', '$.a' TRUE ON ERROR)""") == true)
    assert(one("""SELECT json_exists('{"b": 1}', '$.a' TRUE ON ERROR)""") == false)
    // ERROR class: malformed input, behavior applies
    assert(one("""SELECT json_exists('{oops', '$.a' TRUE ON ERROR)""") == true)
    assert(one("""SELECT json_exists('{oops', '$.a' FALSE ON ERROR)""") == false)
    assert(one("""SELECT json_exists('{oops', '$.a' UNKNOWN ON ERROR)""") == null)
    val e1 = qs.execute("""SELECT json_exists('{oops', '$.a' ERROR ON ERROR)""")
    assert(e1.isLeft && e1.left.exists(_.contains("malformed")), e1)
    // ON EMPTY is not in json_exists's grammar
    val e2 = qs.execute("""SELECT json_exists('{}', '$.a' TRUE ON EMPTY)""")
    assert(e2.isLeft && e2.left.exists(_.contains("not part of its grammar")), e2)
  }

  test("luhn_check: strict mode raises on non-digit input like Trino") {
    // default (total) mode: non-digit → false
    assert(one("SELECT luhn_check('79927398713')") == true)
    assert(one("SELECT luhn_check('79927398714')") == false)
    assert(one("SELECT luhn_check('7992a')") == false)
    spark.conf.set("spark.graft.strictErrors", "true")
    try {
      val e = qs.execute("SELECT luhn_check('7992a')")
      assert(e.isLeft && e.left.exists(_.contains("non-digit")), e)
      // digits still validate in strict mode; empty is false in both
      assert(one("SELECT luhn_check('79927398713')") == true)
      assert(one("SELECT luhn_check('')") == false)
    } finally spark.conf.unset("spark.graft.strictErrors")
  }

  test("WITH TIES: function-call ORDER BY keys with literal args work") {
    // r14 ADVICE (medium): the key list must split at TOP-LEVEL commas
    // only — substr(c, 1, 8)'s '1' is an argument, not an ordinal key.
    // Synth names NATION_0..24: 8-char prefixes group as NATION_0 (1
    // row, rank 1) then NATION_1 = {1, 10..19} (11 rows, rank 2) → 12
    val r = qs.execute(
      """SELECT n_name FROM nation
        |ORDER BY substr(n_name, 1, 8) FETCH FIRST 2 ROWS WITH TIES"""
        .stripMargin)
    assert(r.fold(e => fail(e), _.rows.size) == 12, r)
    // an out-of-range ordinal key is rejected loudly
    val e = qs.execute(
      "SELECT n_name FROM nation ORDER BY substr(n_name, 1, 3), 2 " +
        "FETCH FIRST 2 ROWS WITH TIES")
    assert(e.isLeft && e.left.exists(_.contains("ordinal")), e)
  }

  test("WITH TIES: ordinal ORDER BY keys resolve against the select list") {
    // ordinal → bare column (5 nations share region 0)
    val r1 = qs.execute(
      "SELECT n_regionkey, n_name FROM nation ORDER BY 1 " +
        "FETCH FIRST 2 ROWS WITH TIES")
    assert(r1.fold(e => fail(e), _.rows.size) == 5, r1)
    // ordinal → AS alias of an expression
    val r2 = qs.execute(
      "SELECT n_regionkey % 2 AS par, n_name FROM nation ORDER BY 1 " +
        "FETCH FIRST 2 ROWS WITH TIES")
    assert(r2.fold(e => fail(e), _.rows.size) == 15, r2) // regions 0,2,4
    // mixed ordinal + named key; ordinal carries its direction
    val r3 = qs.execute(
      "SELECT n_regionkey, n_name FROM nation ORDER BY 1 DESC, n_name " +
        "FETCH FIRST 2 ROWS WITH TIES")
    assert(r3.fold(e => fail(e), _.rows.size) == 2, r3)
    // unaliased-expression ordinal still rejects with a named fix
    val e1 = qs.execute(
      "SELECT n_regionkey % 2, n_name FROM nation ORDER BY 1 " +
        "FETCH FIRST 2 ROWS WITH TIES")
    assert(e1.isLeft && e1.left.exists(_.contains("alias")), e1)
  }

  test("WITH TIES: OFFSET folds into the rank rewrite (ANSI order)") {
    // region 0 has 5 nations; skip 2, fetch 2 → positions 3,4 are still
    // region 0, ties extend through the remaining region-0 rows = 3
    val r1 = qs.execute(
      "SELECT n_regionkey FROM nation ORDER BY n_regionkey " +
        "OFFSET 2 ROWS FETCH FIRST 2 ROWS WITH TIES")
    assert(r1.fold(e => fail(e), _.rows.size) == 3, r1)
    // skip 4: position 5 closes region 0 (1 row), positions 6.. are
    // region 1 — boundary row 6 is region 1, ties = all 5 of region 1
    val r2 = qs.execute(
      "SELECT n_regionkey FROM nation ORDER BY n_regionkey " +
        "OFFSET 4 ROWS FETCH FIRST 2 ROWS WITH TIES")
    assert(r2.fold(e => fail(e), _.rows.size) == 6, r2)
    // offset beyond the data → empty, fetch beyond → whole remainder
    val r3 = qs.execute(
      "SELECT n_regionkey FROM nation ORDER BY n_regionkey " +
        "OFFSET 30 ROWS FETCH FIRST 2 ROWS WITH TIES")
    assert(r3.fold(e => fail(e), _.rows.size) == 0, r3)
    val r4 = qs.execute(
      "SELECT n_regionkey FROM nation ORDER BY n_regionkey " +
        "OFFSET 20 ROWS FETCH FIRST 99 ROWS WITH TIES")
    assert(r4.fold(e => fail(e), _.rows.size) == 5, r4)
    // unprojected key + OFFSET rides the in-block retry
    val r5 = qs.execute(
      "SELECT n_name FROM nation ORDER BY n_regionkey " +
        "OFFSET 2 ROWS FETCH FIRST 2 ROWS WITH TIES")
    assert(r5.fold(e => fail(e), _.rows.size) == 3, r5)
    // ordinal + OFFSET compose
    val r6 = qs.execute(
      "SELECT n_regionkey, n_name FROM nation ORDER BY 1 " +
        "OFFSET 4 ROWS FETCH FIRST 2 ROWS WITH TIES")
    assert(r6.fold(e => fail(e), _.rows.size) == 6, r6)
  }

  test("WITH TIES: unprojected ORDER BY keys resolve via in-block retry") {
    // r14 ADVICE (low): legal SQL sorting by a column outside the
    // projection — the outer rank() form can't see it; the retry ranks
    // inside the block (5 nations share region 0 → 5 rows)
    val r = qs.execute(
      """SELECT n_name FROM nation
        |ORDER BY n_regionkey FETCH FIRST 2 ROWS WITH TIES""".stripMargin)
    assert(r.fold(e => fail(e), _.rows.size) == 5, r)
    // grouped block, aggregate key (in-block window over the agg)
    val g = qs.execute(
      """SELECT n_regionkey FROM nation GROUP BY n_regionkey
        |ORDER BY count(*) FETCH FIRST 2 ROWS WITH TIES""".stripMargin)
    assert(g.fold(e => fail(e), _.rows.size) == 5, g)
    // a key that resolves NOWHERE still errors
    val e = qs.execute(
      "SELECT n_name FROM nation ORDER BY no_such_col " +
        "FETCH FIRST 2 ROWS WITH TIES")
    assert(e.isLeft, e)
  }

  test("quantified comparison rejects nondeterministic subqueries") {
    // r14 ADVICE (low): the rewrite evaluates the subquery more than
    // once; rand()/uuid() copies would disagree — curated reject
    val e = qs.execute(
      "SELECT 1 > ALL (SELECT rand() FROM region)")
    assert(e.isLeft && e.left.exists(_.contains("nondeterministic")), e)
    val e2 = qs.execute(
      "SELECT 'x' <> ALL (SELECT uuid() FROM region)")
    assert(e2.isLeft && e2.left.exists(_.contains("nondeterministic")), e2)
    // the names as DATA don't trip it (literal content is masked)
    assert(one("SELECT 'rand(' <> ALL (SELECT r_name FROM region)") == true)
  }

  test("AT TIME ZONE INTERVAL rejects non-canonical minute fields") {
    // r14 ADVICE (low): '8:99' and '8:-30' must be rejected, not
    // silently renormalized
    val e1 = qs.execute(
      "SELECT TIMESTAMP '2001-08-22 03:04:05' AT TIME ZONE INTERVAL '8:99' HOUR TO MINUTE")
    assert(e1.isLeft && e1.left.exists(_.contains("minute field")), e1)
    val e2 = qs.execute(
      "SELECT TIMESTAMP '2001-08-22 03:04:05' AT TIME ZONE INTERVAL '8:-30' HOUR TO MINUTE")
    assert(e2.isLeft && e2.left.exists(_.contains("minute field")), e2)
    // canonical forms still pass
    assert(one("""SELECT CAST(TIMESTAMP '2001-08-22 03:04:05'
                 |  AT TIME ZONE INTERVAL '8:30' HOUR TO MINUTE AS STRING)"""
      .stripMargin).toString.contains("11:34:05"))
  }

  test("quantified left-operand walk: binary minus after CASE END hints") {
    // r14 ADVICE (low): `CASE … END - 1 > ALL (q)` has an unparseable
    // left side — the parenthesize hint must fire, not a mangled splice
    val e = qs.execute(
      "SELECT CASE WHEN true THEN 2 ELSE 3 END - 1 > ALL " +
        "(SELECT r_regionkey FROM region WHERE r_regionkey < 1)")
    assert(e.isLeft && e.left.exists(_.contains("parenthesize")), e)
    // parenthesized it works; genuine unary signs still absorb
    assert(one("SELECT (CASE WHEN true THEN 2 ELSE 3 END - 1) > ALL " +
      "(SELECT r_regionkey FROM region WHERE r_regionkey < 1)") == true)
    assert(one("SELECT -1 <= ALL (SELECT r_regionkey FROM region)") == true)
    assert(one("SELECT 2 * -1 <= ALL (SELECT r_regionkey FROM region)") == true)
  }

  test("regexp_position counts code points, not UTF-16 units") {
    // '𝒳' (U+1D4B3) is a supplementary character: 2 UTF-16 units but
    // ONE Trino position — the match after it sits at position 2
    assert(one("SELECT regexp_position('𝒳b', 'b')") == 2)
    // start offsets are code-point positions too
    assert(one("SELECT regexp_position('𝒳bb', 'b', 2)") == 2)
    assert(one("SELECT regexp_position('𝒳bb', 'b', 3)") == 3)
    // start just past the end returns -1 (code-point length = 3)
    assert(one("SELECT regexp_position('𝒳bb', 'b', 4)") == -1)
  }

  test("WITH RECURSIVE and json_value RETURNING") {
    // recursive CTEs are NATIVE in Spark 4.1 — pinned so a regression
    // (or a future dialect rewrite touching WITH) is caught
    assert(one("""WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL
                 |  SELECT n + 1 FROM t WHERE n < 5)
                 |SELECT sum(n) FROM t""".stripMargin) == 15L)
    // SQL/JSON RETURNING clause → CAST through the Trino type grammar
    assert(one("""SELECT json_value('{"a": 7}', 'lax $.a' RETURNING BIGINT) + 1""")
      == 8L)
    assert(one("""SELECT json_value('{"a": 7}', 'lax $.a' RETURNING varchar)""")
      == "7")
    assert(one("SELECT 'x RETURNING y'") == "x RETURNING y")
  }

  test("array_agg keeps NULL elements and takes ORDER BY") {
    def arr(sql: String): Seq[Any] =
      one(sql).asInstanceOf[scala.collection.Seq[Any]].toSeq
    // bare array_agg keeps nulls (Spark's native alias drops them)
    assert(arr("""SELECT array_agg(v) FROM (SELECT CASE WHEN x = 2
                 |  THEN NULL ELSE x END AS v FROM (VALUES 1, 2, 3) t(x))""".stripMargin)
      .count(_ == null) == 1)
    // ORDER BY: single key, both directions
    assert(arr("""SELECT array_agg(n_name ORDER BY n_nationkey)
                 |FROM nation WHERE n_regionkey = 1""".stripMargin).head == "NATION_1")
    assert(arr("""SELECT array_agg(n_nationkey ORDER BY n_name DESC)
                 |FROM nation WHERE n_regionkey = 1""".stripMargin)
      == Seq(6L, 21L, 16L, 11L, 1L))
    // multi-key, shared direction
    assert(arr("""SELECT array_agg(n_nationkey ORDER BY n_regionkey DESC,
                 |  n_name DESC) FROM nation WHERE n_nationkey < 3""".stripMargin)
      == Seq(2L, 1L, 0L))
    // Trino's null-key defaults: ASC puts null keys LAST, DESC FIRST
    assert(arr("""SELECT array_agg(x ORDER BY k) FROM (VALUES (1, 10),
                 |  (2, CAST(NULL AS INT)), (3, 5)) t(x, k)""".stripMargin)
      == Seq(3, 1, 2))
    assert(arr("""SELECT array_agg(x ORDER BY k DESC) FROM (VALUES (1, 10),
                 |  (2, CAST(NULL AS INT)), (3, 5)) t(x, k)""".stripMargin)
      == Seq(2, 1, 3))
    assert(arr("""SELECT array_agg(x ORDER BY k NULLS FIRST) FROM (VALUES
                 |  (1, 10), (2, CAST(NULL AS INT)), (3, 5)) t(x, k)""".stripMargin)
      == Seq(2, 3, 1))
    // DISTINCT + ORDER BY: dedup (collect_set face), then the same
    // null-exact sort; Trino only allows the key to BE the expression
    val dist = one(
      "SELECT array_agg(DISTINCT n_regionkey ORDER BY n_regionkey DESC) FROM nation")
      .asInstanceOf[scala.collection.Seq[_]].toSeq
    assert(dist == Seq(4L, 3L, 2L, 1L, 0L))
    val distNulls = one(
      """SELECT array_agg(DISTINCT nullif(n_regionkey, 0)
        |                 ORDER BY nullif(n_regionkey, 0) ASC)
        |FROM nation""".stripMargin)
      .asInstanceOf[scala.collection.Seq[_]].toSeq
    assert(distNulls == Seq(1L, 2L, 3L, 4L, null)) // ASC → NULLS LAST
    // a free ORDER BY key with DISTINCT rejects (Trino's own rule)
    val e1 = qs.execute(
      "SELECT array_agg(DISTINCT n_name ORDER BY n_regionkey) FROM nation")
    assert(e1.isLeft && e1.left.exists(_.contains("DISTINCT")))
    // MIXED directions ride array_sort's comparator lambda; the
    // expectation is derived from plain ordered queries, not pinned
    def col(sql: String): Seq[Any] =
      qs.execute(sql).fold(e => fail(s"$sql -> $e"), _.rows.map(_.head))
    def regionKeysDesc(r: Int): Seq[Any] = col(
      s"SELECT n_nationkey FROM nation WHERE n_regionkey = $r ORDER BY n_nationkey DESC")
    val mixed = one(
      """SELECT array_agg(n_nationkey ORDER BY n_regionkey ASC, n_nationkey DESC)
        |FROM nation WHERE n_regionkey <= 1""".stripMargin)
      .asInstanceOf[scala.collection.Seq[_]].toSeq
    assert(mixed == regionKeysDesc(0) ++ regionKeysDesc(1))
    // a sort key whose NAME ends in desc is a key, not key+direction
    val aliased = one(
      """SELECT array_agg(k ORDER BY total_desc)
        |FROM (SELECT n_nationkey AS k, -n_nationkey AS total_desc
        |      FROM nation WHERE n_nationkey < 3) t""".stripMargin)
      .asInstanceOf[scala.collection.Seq[_]].toSeq
    assert(aliased == Seq(2L, 1L, 0L))
    // mixed directions with NULL keys: explicit NULLS placement honored
    // (NULL region — was 0 — first, keys desc within, then region 1 desc)
    val mixedNulls = one(
      """SELECT array_agg(n_nationkey ORDER BY nullif(n_regionkey, 0) ASC NULLS FIRST,
        |                 n_nationkey DESC)
        |FROM nation WHERE n_regionkey <= 1""".stripMargin)
      .asInstanceOf[scala.collection.Seq[_]].toSeq
    assert(mixedNulls == regionKeysDesc(0) ++ regionKeysDesc(1))
  }

  test("quantified comparisons: = ANY -> IN, <> ALL -> NOT IN") {
    assert(one("""SELECT count(*) FROM nation
                 |WHERE n_regionkey = ANY (SELECT r_regionkey FROM region
                 |                         WHERE r_name = 'ASIA')""".stripMargin)
      == 5L)
    assert(one("""SELECT count(*) FROM nation
                 |WHERE n_regionkey <> ALL (SELECT r_regionkey FROM region
                 |                          WHERE r_name = 'ASIA')""".stripMargin)
      == 20L)
    assert(one("""SELECT count(*) FROM nation
                 |WHERE n_regionkey = SOME (SELECT r_regionkey FROM region)""".stripMargin)
      == 25L)
    // Spark's any() boolean aggregate keeps working (expression arg)
    assert(one("SELECT any(n_regionkey = 2) FROM nation") == true)
    // literals are data
    assert(one("SELECT 'x = ANY (SELECT 1)'") == "x = ANY (SELECT 1)")
  }

  test("quantified comparisons: ordered and ALL forms are exact 3VL") {
    // region keys are {0,1,2,3,4}
    // ordered ALL over a nonempty set
    assert(one("SELECT 24 > ALL (SELECT r_regionkey FROM region)") == true)
    assert(one("SELECT 4 > ALL (SELECT r_regionkey FROM region)") == false)
    assert(one("SELECT 4 >= ALL (SELECT r_regionkey FROM region)") == true)
    assert(one("SELECT 0 <= ALL (SELECT r_regionkey FROM region)") == true)
    assert(one("SELECT 1 <= ALL (SELECT r_regionkey FROM region)") == false)
    // ordered ANY
    assert(one("SELECT 1 > ANY (SELECT r_regionkey FROM region)") == true)
    assert(one("SELECT 0 > ANY (SELECT r_regionkey FROM region)") == false)
    assert(one("SELECT 3 < ANY (SELECT r_regionkey FROM region)") == true)
    // the empty set: ALL vacuously TRUE, ANY FALSE — even for NULL X
    assert(one("SELECT NULL > ALL (SELECT r_regionkey FROM region WHERE r_regionkey > 99)") == true)
    assert(one("SELECT NULL < ANY (SELECT r_regionkey FROM region WHERE r_regionkey > 99)") == false)
    assert(one("SELECT 2 = ALL (SELECT r_regionkey FROM region WHERE r_regionkey > 99)") == true)
    assert(one("SELECT 2 <> ANY (SELECT r_regionkey FROM region WHERE r_regionkey > 99)") == false)
    // a NULL inside the subquery demotes TRUE to UNKNOWN, preserves FALSE
    val nullsQ = "(SELECT CASE WHEN r_regionkey = 4 THEN NULL ELSE r_regionkey END FROM region)"
    assert(one(s"SELECT 24 > ALL $nullsQ") == null)
    assert(one(s"SELECT 2 > ALL $nullsQ") == false)
    assert(one(s"SELECT 0 > ANY $nullsQ") == null)
    assert(one(s"SELECT 1 > ANY $nullsQ") == true)
    // NULL left operand over a nonempty set is UNKNOWN
    assert(one("SELECT NULL > ALL (SELECT r_regionkey FROM region)") == null)
    // = ALL and <> ANY
    assert(one("SELECT 3 = ALL (SELECT r_regionkey FROM region WHERE r_regionkey = 3)") == true)
    assert(one("SELECT 3 = ALL (SELECT r_regionkey FROM region)") == false)
    assert(one("SELECT 3 <> ANY (SELECT r_regionkey FROM region)") == true)
    assert(one("SELECT 3 <> ANY (SELECT r_regionkey FROM region WHERE r_regionkey = 3)") == false)
    // arithmetic and parenthesized left operands (the backward walker)
    assert(one("SELECT 20 + 4 >= ALL (SELECT r_regionkey FROM region)") == true)
    assert(one("SELECT 2 * 3 > ALL (SELECT r_regionkey FROM region)") == true)
    assert(one("SELECT (CASE WHEN 1 = 1 THEN 5 END) > ALL (SELECT r_regionkey FROM region)") == true)
    assert(one("SELECT abs(-24) > ALL (SELECT r_regionkey FROM region)") == true)
    // in WHERE position
    assert(one("""SELECT count(*) FROM nation
                 |WHERE n_nationkey >= ALL (SELECT n_nationkey FROM nation)""".stripMargin) == 1L)
    assert(one("""SELECT count(*) FROM nation
                 |WHERE n_nationkey < ALL (SELECT r_regionkey FROM region)""".stripMargin) == 0L)
    // correlated subquery
    assert(one("""SELECT count(*) FROM nation
                 |WHERE n_nationkey = ALL (SELECT r_regionkey FROM region
                 |                         WHERE r_regionkey <= n_nationkey)""".stripMargin) == 1L)
    // an unboundable left operand (bare CASE … END) rejects with a hint
    val e = qs.execute(
      "SELECT CASE WHEN 1 = 1 THEN 5 END > ALL (SELECT r_regionkey FROM region)")
    assert(e.isLeft && e.left.exists(_.contains("parenthesize")))
  }

  test("quantified comparisons: left-operand walker fuzz (100 composed shapes)") {
    // the backward valueExpression walker must bound exactly the
    // operand Trino's grammar would: literals, unary signs, paren
    // groups, function calls, and +-*-chains — each case's value is
    // computed alongside its text, and the splice must also respect
    // the surrounding WHERE precedence (AND binds around the rewrite)
    val rnd = new scala.util.Random(20260817L)
    def genAtom(depth: Int): (String, Long) = {
      val pick = rnd.nextInt(if (depth > 2) 3 else 6)
      pick match {
        case 0 | 3 =>
          val v = rnd.nextInt(9) + 1L; (v.toString, v)
        case 1 =>
          val v = rnd.nextInt(9) + 1L; (s"abs(-$v)", v)
        case 2 =>
          val v = rnd.nextInt(9) + 1L; (s"($v)", v)
        case 4 =>
          val (e, v) = genExpr(depth + 1); (s"($e)", v)
        case 5 =>
          val (e, v) = genAtom(depth + 1); (s"greatest($e, -99)", v)
      }
    }
    def genExpr(depth: Int): (String, Long) = {
      var (s, v) = genAtom(depth)
      if (rnd.nextInt(3) == 0) { s = s"-$s"; v = -v } // unary sign
      (0 until rnd.nextInt(3)).foreach { _ =>
        val (s2, v2) = genAtom(depth)
        rnd.nextInt(3) match {
          case 0 => s = s"$s + $s2"; v += v2
          case 1 => s = s"$s - $s2"; v -= v2
          case 2 => s = s"($s) * $s2"; v *= v2 // parens keep seq = SQL
        }
      }
      (s, v)
    }
    for (i <- 1 to 100) {
      val (e, v) = genExpr(0)
      val t = rnd.nextInt(21) - 10
      val expected = v > t
      val projected = one(s"SELECT $e > ALL (SELECT $t) AS r")
      assert(projected == expected, s"case $i: SELECT $e > ALL (SELECT $t) — v=$v")
      val whereCnt = one(
        s"SELECT count(*) FROM region WHERE r_regionkey = 0 AND $e > ALL (SELECT $t)")
      assert(whereCnt == (if (expected) 1L else 0L),
        s"case $i WHERE: $e > ALL (SELECT $t) — v=$v")
    }
  }

  test("quantified comparisons: 200-case differential fuzz vs direct 3VL") {
    // every (op, quantifier) against random small sets with NULLs and
    // the empty set, expected value computed by a direct Kleene-logic
    // fold — the adversarial check that the min/max rewrite composition
    // cannot drift from ∀/∃ semantics on any corner
    val rnd = new scala.util.Random(20260816L)
    val ops = Seq("<", "<=", ">", ">=", "=", "<>")
    val quants = Seq("ANY", "ALL", "SOME")
    def cmp(op: String, a: Int, b: Int): Boolean = op match {
      case "<" => a < b
      case "<=" => a <= b
      case ">" => a > b
      case ">=" => a >= b
      case "=" => a == b
      case "<>" => a != b
    }
    for (i <- 1 to 200) {
      val n = rnd.nextInt(5)
      val vals: Seq[Option[Int]] =
        Seq.fill(n)(if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(5)))
      val x: Option[Int] = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(5))
      val op = ops(rnd.nextInt(ops.size))
      val q = quants(rnd.nextInt(quants.size))
      val perRow: Seq[Option[Boolean]] = vals.map {
        case None => None
        case Some(v) => x.map(xx => cmp(op, xx, v))
      }
      val isAll = q == "ALL"
      val expected: Any =
        if (isAll) {
          if (perRow.contains(Some(false))) false
          else if (perRow.forall(_ == Some(true))) true // empty → TRUE
          else null
        } else {
          if (perRow.contains(Some(true))) true
          else if (perRow.forall(_ == Some(false))) false // empty → FALSE
          else null
        }
      val xSql = x.map(_.toString).getOrElse("CAST(NULL AS INT)")
      val subq =
        if (n == 0) "SELECT CAST(NULL AS INT) AS v WHERE 1 = 0"
        else {
          val rows = vals.map {
            case None => "(CAST(NULL AS INT))"
            case Some(v) => s"($v)"
          }.mkString(", ")
          s"SELECT v FROM (VALUES $rows) t(v)"
        }
      val sql = s"SELECT $xSql $op $q ($subq) AS r"
      val got = qs.execute(sql).fold(
        err => fail(s"case $i: $sql -> $err"), _.rows.head.head)
      assert(got == expected,
        s"case $i: $sql — vals=$vals x=$x expected=$expected got=$got")
    }
  }

  test("map_keys_by_top_n_values: keys of the n largest values") {
    assert(one("""SELECT map_keys_by_top_n_values(
                 |  map('a', 1, 'b', 3, 'c', 2), 2)""".stripMargin)
      .asInstanceOf[scala.collection.Seq[_]].toSeq == Seq("b", "c"))
  }

  test("CAST targets accept Trino's type grammar") {
    assert(one("SELECT CAST(1 AS varchar)") == "1")
    assert(one("SELECT CAST('x' AS char)") == "x")
    assert(one("SELECT typeof(CAST(1 AS real))") == "real")
    assert(one("SELECT CAST(X'41' AS varbinary)").asInstanceOf[Array[Byte]].head == 0x41)
    assert(one("SELECT CAST(array(1, 2) AS array(varchar))")
      .asInstanceOf[scala.collection.Seq[_]].toSeq == Seq("1", "2"))
    assert(one("SELECT element_at(CAST(map('a', 1) AS map(varchar, double)), 'a')")
      == 1.0)
    // ROW types translate to STRUCT with field access working after
    assert(one("SELECT CAST(struct(1, 2) AS ROW(x BIGINT, y DOUBLE)).y") == 2.0)
    assert(one("SELECT CAST(struct(1, struct(2)) AS ROW(a INT, b ROW(c BIGINT))).b.c") == 2L)
    // precision parameters drop; with time zone maps to the UTC instant
    assert(one("SELECT typeof(CAST('2001-01-01 01:02:03' AS timestamp(3)))")
      .toString.startsWith("timestamp"))
    assert(one("SELECT CAST(TIMESTAMP '2001-01-01 01:02:03' AS timestamp with time zone)")
      .toString.startsWith("2001-01-01 01:02:03"))
    // nested CASTs: each target translated independently
    assert(one("SELECT CAST(CAST(1 AS varchar) AS integer)") == 1)
    // Spark-legal spellings are untouched; literals are data
    assert(one("SELECT CAST(1.5 AS decimal(10, 2))").toString == "1.50")
    assert(one("SELECT 'CAST(1 AS varchar)'") == "CAST(1 AS varchar)")
    // try_cast gets the same grammar
    assert(one("SELECT TRY_CAST('zz' AS integer)") == null)
    assert(one("SELECT TRY_CAST(1 AS varchar)") == "1")
    // the ROW constructor + named-ROW cast, Trino's whole row workflow
    assert(one("SELECT CAST(ROW(1, 'a') AS ROW(id BIGINT, tag VARCHAR)).tag") == "a")
  }

  test("typed literals: DECIMAL/DOUBLE/REAL/BIGINT/... 'text' forms") {
    // DECIMAL gets Trino's exact literal typing (precision/scale from
    // the text), visible through typeof
    assert(one("SELECT typeof(DECIMAL '1.23')") == "decimal(3,2)")
    assert(one("SELECT typeof(DECIMAL '0.2')") == "decimal(1,1)")
    assert(one("SELECT typeof(DECIMAL '-20.3')") == "decimal(3,1)")
    assert(one("SELECT DECIMAL '1.23' + DECIMAL '0.07'").toString == "1.30")
    assert(one("SELECT DOUBLE '1.5' * 2") == 3.0)
    assert(one("SELECT typeof(REAL '1.5')") == "real")
    assert(one("SELECT BIGINT '7' + 1") == 8L)
    assert(one("SELECT typeof(SMALLINT '7')") == "smallint")
    assert(one("SELECT TINYINT '7'").toString == "7")
    assert(one("SELECT BOOLEAN 'true'") == true)
    assert(one("SELECT VARCHAR 'hi' || CHAR 'x'") == "hix")
    assert(one("SELECT UUID '12345678-1234-1234-1234-123456789ABC'")
      == "12345678-1234-1234-1234-123456789abc")
    assert(one("""SELECT json_array_length(JSON '[1, 2, 3]')""") == 3)
    // native Spark typed literals pass through untouched
    assert(one("SELECT typeof(DATE '2001-01-01')") == "date")
    // inside a string literal it is data
    assert(one("SELECT 'DECIMAL ''1.2'''") == "DECIMAL '1.2'")
    // malformed DECIMAL text fails loudly
    val e = qs.execute("SELECT DECIMAL '1.2.3'")
    assert(e.isLeft && e.left.exists(_.contains("DECIMAL")))
  }

  test("literal round-trip fuzz: any Trino-quoted string survives the pipeline") {
    // Trino quoting = double the quotes, nothing else. 300 random
    // strings over a hostile alphabet (backslashes, quotes, regex
    // metacharacters, '' runs) must come back byte-exact through the
    // full served pipeline (guard -> preprocess doubling -> Spark parse).
    val rnd = new scala.util.Random(20260816)
    val alphabet = """\'"abz019 .*+?()[]{}|^$-_/""" + "\\"
    (1 to 300).foreach { _ =>
      val len = 1 + rnd.nextInt(12)
      val s = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val quoted = "'" + s.replace("'", "''") + "'"
      val got = one(s"SELECT $quoted AS v")
      assert(got == s, s"round-trip broke: sent <$s> via $quoted got <$got>")
    }
  }

  test("AT TIME ZONE operator rewrites onto at_timezone()") {
    // same instant rendered in another zone (sessions are pinned UTC)
    assert(one("SELECT TIMESTAMP '2001-08-22 03:04:05' AT TIME ZONE 'America/Los_Angeles'")
      .toString.startsWith("2001-08-21 20:04:05"))
    // offset-string zones; paren and function-call operands
    assert(one("SELECT (TIMESTAMP '2001-08-22 03:04:05') AT TIME ZONE '+08:00'")
      .toString.startsWith("2001-08-22 11:04:05"))
    assert(one("""SELECT CAST('2001-08-22 03:04:05' AS TIMESTAMP)
                 |  AT TIME ZONE 'UTC'""".stripMargin)
      .toString.startsWith("2001-08-22 03:04:05"))
    // column operand + expression zone; binds tighter than comparison
    assert(one("""SELECT count(*) FROM orders
                 |WHERE o_orderdate AT TIME ZONE 'UTC' = o_orderdate""".stripMargin)
      .asInstanceOf[Long] > 0)
    // INTERVAL zones fold into the same fixed-offset path
    assert(one("""SELECT CAST(TIMESTAMP '2001-08-22 03:04:05'
                 |  AT TIME ZONE INTERVAL '8' HOUR AS STRING)""".stripMargin)
      == one("""SELECT CAST(TIMESTAMP '2001-08-22 03:04:05'
               |  AT TIME ZONE '+08:00' AS STRING)""".stripMargin))
    assert(one("""SELECT CAST(TIMESTAMP '2001-08-22 03:04:05'
                 |  AT TIME ZONE INTERVAL '-30' MINUTE AS STRING)""".stripMargin)
      == one("""SELECT CAST(TIMESTAMP '2001-08-22 03:04:05'
               |  AT TIME ZONE '-00:30' AS STRING)""".stripMargin))
    assert(one("""SELECT CAST(TIMESTAMP '2001-08-22 03:04:05'
                 |  AT TIME ZONE INTERVAL '05:45' HOUR TO MINUTE AS STRING)""".stripMargin)
      == one("""SELECT CAST(TIMESTAMP '2001-08-22 03:04:05'
               |  AT TIME ZONE '+05:45' AS STRING)""".stripMargin))
    // out-of-range and unparseable offsets reject loudly
    val e = qs.execute(
      "SELECT TIMESTAMP '2001-08-22 03:04:05' AT TIME ZONE INTERVAL '15' HOUR")
    assert(e.isLeft && e.left.exists(_.contains("14:00")))
    val e2 = qs.execute(
      "SELECT TIMESTAMP '2001-08-22 03:04:05' AT TIME ZONE INTERVAL '8' DAY")
    assert(e2.isLeft && e2.left.exists(_.contains("HOUR or MINUTE")))
    // inside a literal it is data
    assert(one("SELECT 'x AT TIME ZONE y'") == "x AT TIME ZONE y")
  }

  test("ANSI row-limiting: FETCH FIRST / OFFSET ... ROWS / OFFSET-LIMIT order") {
    def keys(sql: String): Seq[Any] =
      qs.execute(sql).fold(e => fail(s"$sql -> $e"), _.rows.map(_.head))
    assert(keys("SELECT n_nationkey FROM nation ORDER BY n_nationkey FETCH FIRST 3 ROWS ONLY")
      == Seq(0L, 1L, 2L))
    assert(keys("SELECT n_nationkey FROM nation ORDER BY n_nationkey FETCH NEXT ROW ONLY")
      == Seq(0L))
    assert(keys("SELECT n_nationkey FROM nation ORDER BY n_nationkey OFFSET 2 ROWS FETCH FIRST 3 ROWS ONLY")
      == Seq(2L, 3L, 4L))
    // Trino's OFFSET-before-LIMIT order is swapped for Spark
    assert(keys("SELECT n_nationkey FROM nation ORDER BY n_nationkey OFFSET 23 LIMIT 5")
      == Seq(23L, 24L))
    assert(keys("SELECT n_nationkey FROM nation ORDER BY n_nationkey OFFSET 23 ROWS")
      == Seq(23L, 24L))
    // the keywords inside a literal are data
    assert(one("SELECT 'OFFSET 2 ROWS FETCH FIRST 3 ROWS ONLY'")
      == "OFFSET 2 ROWS FETCH FIRST 3 ROWS ONLY")
  }

  test("FETCH FIRST n ROWS WITH TIES keeps the whole tie group") {
    def rows(sql: String): Seq[Seq[Any]] =
      qs.execute(sql).fold(e => fail(s"$sql -> $e"), _.rows.map(_.toSeq))
    // 5 nations per region: FETCH FIRST 1 WITH TIES on region key 0
    // returns all 5 of them
    val r = rows("SELECT n_regionkey FROM nation ORDER BY n_regionkey FETCH FIRST 1 ROWS WITH TIES")
    assert(r.size == 5 && r.forall(_ == Seq(0L)))
    // cutoff inside a group: first 7 by region key → regions 0 and all
    // of 1 (10 rows)
    val r2 = rows("SELECT n_regionkey FROM nation ORDER BY n_regionkey FETCH FIRST 7 ROWS WITH TIES")
    assert(r2.size == 10 && r2.map(_.head).toSet == Set(0L, 1L))
    // no ties at the cutoff → plain limit; DESC keys honored
    val r3 = rows("SELECT n_nationkey FROM nation ORDER BY n_nationkey DESC FETCH FIRST 2 ROWS WITH TIES")
    assert(r3.map(_.head) == Seq(24L, 23L))
    // count defaults to 1; works in a subquery block
    val r4 = rows("""SELECT count(*) FROM (
                    |  SELECT n_regionkey FROM nation ORDER BY n_regionkey FETCH FIRST ROW WITH TIES
                    |) t""".stripMargin)
    assert(r4 == Seq(Seq(5L)))
    // reject: no ORDER BY (ties are defined by the sort key)
    val e1 = qs.execute("SELECT n_nationkey FROM nation FETCH FIRST 5 ROWS WITH TIES")
    assert(e1.isLeft && e1.left.exists(_.contains("ORDER BY")))
    // ordinal keys and the OFFSET combo are supported (r15)
    val r5 = rows("SELECT n_nationkey FROM nation ORDER BY 1 FETCH FIRST 5 ROWS WITH TIES")
    assert(r5.map(_.head) == Seq(0L, 1L, 2L, 3L, 4L))
    val r6 = rows(
      "SELECT n_nationkey FROM nation ORDER BY n_nationkey OFFSET 2 ROWS FETCH FIRST 5 ROWS WITH TIES")
    assert(r6.map(_.head) == Seq(2L, 3L, 4L, 5L, 6L))
    // inside a literal it is data
    assert(one("SELECT 'FETCH FIRST 5 ROWS WITH TIES'") == "FETCH FIRST 5 ROWS WITH TIES")
  }

  test("string literals have Trino semantics: backslash is ordinary, '' escapes") {
    // a Trino user's regexp keeps its backslashes (Spark's default
    // parser would eat them: '\d+' -> 'd+'); the dialect pre-pass
    // doubles them inside literals before Spark parses
    assert(one("SELECT '\\d+'") == "\\d+")
    assert(one("SELECT length('a\\b')") == 3)
    // '' still collapses (the reason escapedStringLiterals is NOT used)
    assert(one("SELECT 'it''s'") == "it's")
    // a literal ENDING in a backslash terminates at its closing quote
    // (Spark alone would read \' as an escaped quote and mis-parse)
    assert(one("SELECT 'C:\\'") == "C:\\")
    // comments and double-quoted identifiers are untouched
    assert(one("SELECT 1 AS n -- a \\d comment\n") == 1)
    // doubled backslash in the source = one escaped backslash in Trino?
    // no — Trino has no backslash escapes: two chars in, two chars out
    assert(one("SELECT length('\\\\')") == 2)
  }

  test("regexp_replace lambda form: per-match function over capture groups") {
    // Trino's own docs example (initcap); element_at is the engine's
    // portable 1-based subscript (DIALECT.md: `[]` stays Spark-0-based),
    // so element_at(x, n) = capture group n exactly as in Trino
    assert(one("""SELECT regexp_replace('new york', '(\w)(\w*)',
                 |  x -> upper(element_at(x, 1)) || element_at(x, 2))""".stripMargin)
      == "New York")
    // non-matching segments copy through verbatim
    assert(one("""SELECT regexp_replace('a-12-b-3', '(\d+)',
                 |  x -> cast(cast(element_at(x, 1) AS INT) * 2 AS STRING))""".stripMargin)
      == "a-24-b-6")
    // a group that did not participate is NULL (coalesce sees it)
    assert(one("""SELECT regexp_replace('ab', '(a)|(b)',
                 |  x -> coalesce(element_at(x, 2), 'A'))""".stripMargin) == "Ab")
    // zero capture groups → empty array; NULL inputs → NULL
    assert(one("SELECT regexp_replace('xyx', 'y', x -> cast(size(x) AS STRING))") == "x0x")
    assert(one("SELECT regexp_replace(CAST(NULL AS STRING), 'y', x -> 'z')") == null)
    // a NULL lambda result is an ERROR (Trino's non-null contract),
    // never a silent empty replacement
    val err = qs.execute(
      "SELECT regexp_replace('ab', '(a)', x -> CAST(NULL AS STRING))")
    assert(err.isLeft || err.exists(_.rows.isEmpty),
      s"NULL lambda result must fail, got $err")
  }

  test("random forms: [0,1) double, [0,n) and [m,n) bigint") {
    val d = one("SELECT random()").asInstanceOf[Double]
    assert(d >= 0.0 && d < 1.0)
    (1 to 20).foreach { _ =>
      val i = one("SELECT random(10)").asInstanceOf[Long]
      assert(i >= 0L && i < 10L)
      val r = one("SELECT random(5, 8)").asInstanceOf[Long]
      assert(r >= 5L && r < 8L)
    }
  }

  test("from_unixtime_nanos truncates to Spark's microsecond precision") {
    assert(one("SELECT CAST(from_unixtime_nanos(1500000000123456789) AS STRING)")
      == "2017-07-14 02:40:00.123456")
    assert(one("SELECT CAST(from_unixtime_nanos(0) AS STRING)")
      == "1970-01-01 00:00:00")
  }

  test("greatest/least propagate NULL like Trino (Spark's skip nulls)") {
    assert(one("SELECT greatest(1, 2, 3)") == 3)
    assert(one("SELECT least(1, 2, 3)") == 1)
    assert(one("SELECT greatest(1, NULL, 3)") == null)
    assert(one("SELECT least(NULL, 2)") == null)
  }

  test("set_agg collects distinct values; set_union unions arrays") {
    val s = one("SELECT set_agg(x) FROM (VALUES 1, 2, 2, 3, 1) AS t(x)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq.sorted
    assert(s == Seq(1, 2, 3))
    val u = one("SELECT set_union(a) FROM (VALUES array(1, 2), array(2, 3), array(3, 4)) AS t(a)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq.sorted
    assert(u == Seq(1, 2, 3, 4))
  }

  test("skewness is biased (g1) and kurtosis sample-corrected, like Trino") {
    // n=5 data 1,2,3,4,100. Trino's DoubleSkewnessAggregation returns
    // the BIASED estimator g1 = sqrt(n)*m3/m2^1.5 (same as Spark's
    // built-in skewness); only kurtosis is bias-corrected:
    //   G2 = (n-1)/((n-2)(n-3))*((n+1)g2+6)
    val sk = one("SELECT skewness(x) FROM (VALUES 1.0, 2.0, 3.0, 4.0, 100.0) AS t(x)")
      .asInstanceOf[Double]
    val ku = one("SELECT kurtosis(x) FROM (VALUES 1.0, 2.0, 3.0, 4.0, 100.0) AS t(x)")
      .asInstanceOf[Double]
    // g1 computed by hand: mean=22, m3/n=25719.6, (m2/n)^1.5=17174.57 → 1.49754
    assert(math.abs(sk - 1.49754) < 1e-3, s"skewness $sk")
    assert(math.abs(ku - 4.9869) < 1e-3, s"kurtosis $ku")
    // below the minimum group size Trino returns NULL
    assert(one("SELECT skewness(x) FROM (VALUES 1.0, 2.0) AS t(x)") == null)
    assert(one("SELECT kurtosis(x) FROM (VALUES 1.0, 2.0, 3.0) AS t(x)") == null)
  }

  test("greatest/least accept a single argument like Trino") {
    assert(one("SELECT greatest(CAST(7 AS INT))") == 7)
    assert(one("SELECT least(CAST(7 AS INT))") == 7)
    assert(one("SELECT greatest(CAST(NULL AS INT))") == null)
  }

  test("timezone_hour/minute are 0 on the UTC-instant model") {
    assert(one("SELECT timezone_hour(TIMESTAMP '2020-06-01 12:00:00')") == 0L)
    assert(one("SELECT timezone_minute(TIMESTAMP '2020-06-01 12:00:00')") == 0L)
    assert(one("SELECT timezone_hour(CAST(NULL AS TIMESTAMP))") == null)
  }

  test("map_remove_null_values / array_split_into_chunks / array_top_n / array_least_frequent") {
    assert(one("SELECT map_remove_null_values(map('a', 1, 'b', CAST(NULL AS INT)))")
      .asInstanceOf[Map[String, Any]] == Map("a" -> 1))
    assert(one("SELECT array_split_into_chunks(array(1, 2, 3, 4, 5), 2)")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[Int]]].map(_.toSeq).toSeq
      == Seq(Seq(1, 2), Seq(3, 4), Seq(5)))
    assert(one("SELECT array_split_into_chunks(array(1), 3)")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[Int]]].map(_.toSeq).toSeq
      == Seq(Seq(1)))
    assert(one("SELECT array_split_into_chunks(CAST(array() AS ARRAY<INT>), 2)")
      .asInstanceOf[scala.collection.Seq[Any]].isEmpty)
    assert(one("SELECT array_top_n(array(3, 1, 4, 1, 5), 3)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(5, 4, 3))
    assert(one("SELECT array_least_frequent(array(1, 1, 2, 2, 3))")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(3))
    assert(one("SELECT array_least_frequent(array(3, 3, 2, 2, 1, 9, 9, 9), 2)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1, 2))
    // ties: smaller element first
    assert(one("SELECT array_least_frequent(array(2, 1), 2)")
      .asInstanceOf[scala.collection.Seq[Int]].toSeq == Seq(1, 2))
  }

  test("approx_set builds a mergeable HLL sketch under Trino's error contract") {
    val est = one(
      """SELECT hll_sketch_estimate(hll_union_agg(sk)) FROM (
        |  SELECT approx_set(x) AS sk FROM range(0, 10000) AS t(x) GROUP BY x % 4)""".stripMargin)
      .asInstanceOf[Long]
    assert(math.abs(est - 10000L) < 10000 * 0.05, s"estimate $est")
    // tighter error → bigger sketch, still accurate
    val tight = one(
      "SELECT hll_sketch_estimate(approx_set(x, 0.005)) FROM range(0, 10000) AS t(x)")
      .asInstanceOf[Long]
    assert(math.abs(tight - 10000L) < 10000 * 0.02, s"tight estimate $tight")
    assert(qs.execute("SELECT approx_set(l_partkey, 0.5) FROM lineitem").isLeft)
  }

  test("numeric_histogram supports weights and needs >= 2 buckets") {
    val m = one("SELECT numeric_histogram(4, x, w) FROM (VALUES (1.0, 2.0), (2.0, 3.0), (50.0, 1.0)) AS t(x, w)")
      .asInstanceOf[Map[Double, Double]]
    assert(math.abs(m.values.sum - 6.0) < 1e-9)
    assert(qs.execute("SELECT numeric_histogram(1, l_tax) FROM lineitem").isLeft)
  }
}
