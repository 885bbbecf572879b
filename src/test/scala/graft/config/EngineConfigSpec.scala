package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Pinned config parsing/validation behavior, ported case-for-case from
  * reference internal/config/config_test.go:9-336. Env is injected as a
  * Map (no process-global mutation needed, unlike the Go suite). */
class EngineConfigSpec extends AnyFunSuite {

  // --- TestParseAllowlist (config_test.go:9-61) ---
  val parseCases: Seq[(String, String, Seq[String])] = Seq(
    ("empty string", "", Nil),
    ("single item", "hive", Seq("hive")),
    ("multiple items", "hive,postgresql,mysql", Seq("hive", "postgresql", "mysql")),
    ("items with whitespace", " hive , postgresql , mysql ", Seq("hive", "postgresql", "mysql")),
    ("items with empty entries", "hive,,postgresql,,mysql,", Seq("hive", "postgresql", "mysql")),
    ("schema format", "hive.analytics,hive.marts,postgresql.public",
      Seq("hive.analytics", "hive.marts", "postgresql.public")),
    ("table format", "hive.analytics.users,hive.marts.sales",
      Seq("hive.analytics.users", "hive.marts.sales")))

  parseCases.foreach { case (name, input, expected) =>
    test(s"parseAllowlist: $name") {
      assert(EngineConfig.parseAllowlist(input) == expected)
    }
  }

  // --- TestValidateAllowlist (config_test.go:143-204) ---
  val validateCases: Seq[(String, Seq[String], Int, Option[String])] = Seq(
    ("valid schema format", Seq("hive.analytics", "postgresql.public"), 1, None),
    ("valid table format", Seq("hive.analytics.users", "postgresql.public.orders"), 2, None),
    ("invalid schema format - no dots", Seq("hive", "postgresql"), 1,
      Some("invalid format in TEST_ALLOWLIST: 'hive' (expected 1 dots, found 0)")),
    ("invalid schema format - too many dots", Seq("hive.analytics.users"), 1,
      Some("invalid format in TEST_ALLOWLIST: 'hive.analytics.users' (expected 1 dots, found 2)")),
    ("invalid table format - not enough dots", Seq("hive.analytics"), 2,
      Some("invalid format in TEST_ALLOWLIST: 'hive.analytics' (expected 2 dots, found 1)")),
    ("mixed valid and invalid", Seq("hive.analytics", "postgresql"), 1,
      Some("invalid format in TEST_ALLOWLIST: 'postgresql' (expected 1 dots, found 0)")))

  validateCases.foreach { case (name, list, dots, expectedErr) =>
    test(s"validateAllowlist: $name") {
      EngineConfig.validateAllowlist("TEST_ALLOWLIST", list, dots) match {
        case Right(()) => assert(expectedErr.isEmpty)
        case Left(msg) => assert(expectedErr.contains(msg))
      }
    }
  }

  // --- TestNewTrinoConfigWithAllowlists (config_test.go:63-141) ---
  test("fromEnv: allowlists configured") {
    val cfg = EngineConfig.fromEnv(Map(
      "TRINO_ALLOWED_CATALOGS" -> "hive,postgresql",
      "TRINO_ALLOWED_SCHEMAS" -> "hive.analytics,postgresql.public",
      "TRINO_ALLOWED_TABLES" -> "hive.analytics.users")).toOption.get
    assert(cfg.allowedCatalogs == Seq("hive", "postgresql"))
    assert(cfg.allowedSchemas == Seq("hive.analytics", "postgresql.public"))
    assert(cfg.allowedTables == Seq("hive.analytics.users"))
  }
  test("fromEnv: no allowlists means empty lists") {
    val cfg = EngineConfig.fromEnv(Map.empty).toOption.get
    assert(cfg.allowedCatalogs.isEmpty && cfg.allowedSchemas.isEmpty &&
      cfg.allowedTables.isEmpty)
  }

  // --- TestNewTrinoConfigMalformedAllowlist (config_test.go:282-336) ---
  test("fromEnv: malformed schema entry (no dots) fails fast") {
    assert(EngineConfig.fromEnv(Map("TRINO_ALLOWED_SCHEMAS" -> "hive,postgresql.public")) ==
      Left("invalid format in TRINO_ALLOWED_SCHEMAS: 'hive' (expected 1 dots, found 0)"))
  }
  test("fromEnv: malformed schema entry (too many dots) fails fast") {
    assert(EngineConfig.fromEnv(
      Map("TRINO_ALLOWED_SCHEMAS" -> "hive.analytics.users,postgresql.public")) ==
      Left("invalid format in TRINO_ALLOWED_SCHEMAS: 'hive.analytics.users' (expected 1 dots, found 2)"))
  }
  test("fromEnv: malformed table entry (not enough dots) fails fast") {
    assert(EngineConfig.fromEnv(
      Map("TRINO_ALLOWED_TABLES" -> "hive.analytics,hive.analytics.users")) ==
      Left("invalid format in TRINO_ALLOWED_TABLES: 'hive.analytics' (expected 2 dots, found 1)"))
  }

  // --- TestExternalAuthConfiguration (config_test.go:206-280) ---
  test("fromEnv: external auth disabled by default, timeout 300") {
    val cfg = EngineConfig.fromEnv(Map.empty).toOption.get
    assert(!cfg.externalAuth && cfg.externalAuthTimeout == 300)
  }
  test("fromEnv: external auth enabled") {
    val cfg = EngineConfig.fromEnv(Map("TRINO_EXTERNAL_AUTH" -> "true")).toOption.get
    assert(cfg.externalAuth && cfg.externalAuthTimeout == 300)
  }
  test("fromEnv: custom external auth timeout") {
    val cfg = EngineConfig.fromEnv(Map(
      "TRINO_EXTERNAL_AUTH" -> "true",
      "TRINO_EXTERNAL_AUTH_TIMEOUT" -> "600")).toOption.get
    assert(cfg.externalAuth && cfg.externalAuthTimeout == 600)
  }
  test("fromEnv: invalid external auth timeout uses default") {
    val cfg = EngineConfig.fromEnv(Map(
      "TRINO_EXTERNAL_AUTH" -> "true",
      "TRINO_EXTERNAL_AUTH_TIMEOUT" -> "invalid")).toOption.get
    assert(cfg.externalAuth && cfg.externalAuthTimeout == 300)
  }

  // --- Timeout validation (config.go:93-107) ---
  test("fromEnv: query timeout default 30") {
    assert(EngineConfig.fromEnv(Map.empty).toOption.get.queryTimeoutSeconds == 30)
  }
  test("fromEnv: invalid query timeout falls back to default") {
    assert(EngineConfig.fromEnv(Map("TRINO_QUERY_TIMEOUT" -> "abc"))
      .toOption.get.queryTimeoutSeconds == 30)
    assert(EngineConfig.fromEnv(Map("TRINO_QUERY_TIMEOUT" -> "-5"))
      .toOption.get.queryTimeoutSeconds == 30)
  }
  test("fromEnv: valid query timeout applied") {
    assert(EngineConfig.fromEnv(Map("TRINO_QUERY_TIMEOUT" -> "120"))
      .toOption.get.queryTimeoutSeconds == 120)
  }

  // --- Impersonation field validation (config.go:195-199) ---
  test("fromEnv: invalid impersonation field fails with reference error text") {
    assert(EngineConfig.fromEnv(Map("TRINO_IMPERSONATION_FIELD" -> "badfield")) ==
      Left("invalid TRINO_IMPERSONATION_FIELD 'badfield'. Supported fields: username, email, subject"))
  }
  test("fromEnv: impersonation fields username/email/subject accepted") {
    Seq("username", "email", "subject", "USERNAME").foreach { f =>
      assert(EngineConfig.fromEnv(Map("TRINO_IMPERSONATION_FIELD" -> f)).isRight)
    }
  }

  // --- Defaults (config.go:203-228, Spark-adapted catalog) ---
  test("fromEnv: defaults") {
    val cfg = EngineConfig.fromEnv(Map.empty).toOption.get
    assert(cfg.host == "localhost" && cfg.port == 8080 && cfg.user == "trino")
    assert(cfg.catalog == "spark_catalog" && cfg.schema == "default")
    assert(!cfg.allowWriteQueries)
    assert(cfg.source == "mcp-trino/dev")
  }
  test("fromEnv: TRINO_SOURCE override and versioned default") {
    assert(EngineConfig.fromEnv(Map("TRINO_SOURCE" -> "my-app")).toOption.get.source == "my-app")
    assert(EngineConfig.fromEnv(Map.empty, version = "1.2.3").toOption.get.source == "mcp-trino/1.2.3")
  }

  // --- OAuth mode configuration (config.go:70-73; oauth_test.go table) ---
  test("fromEnv: OAuth defaults — disabled, native mode, hmac provider") {
    val cfg = EngineConfig.fromEnv(Map.empty).toOption.get
    assert(!cfg.oauthEnabled && cfg.oauthMode == "native" && cfg.oauthProvider == "hmac")
  }
  test("fromEnv: OAuth enabled with mode/provider lowercased") {
    val cfg = EngineConfig.fromEnv(Map("OAUTH_ENABLED" -> "true",
      "OAUTH_MODE" -> "PROXY", "OAUTH_PROVIDER" -> "HMAC")).toOption.get
    assert(cfg.oauthEnabled && cfg.oauthMode == "proxy" && cfg.oauthProvider == "hmac")
  }
  test("fromEnv: invalid OAuth mode accepted (validation delegated)") {
    val cfg = EngineConfig.fromEnv(Map("OAUTH_MODE" -> "invalid")).toOption.get
    assert(cfg.oauthMode == "invalid" && !cfg.oauthEnabled)
  }
  test("fromEnv: OAUTH_HMAC_SECRET parsed") {
    assert(EngineConfig.fromEnv(Map("OAUTH_HMAC_SECRET" -> "abc"))
      .toOption.get.oauthHmacSecret == "abc")
  }
}
