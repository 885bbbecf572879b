package graft.security

import org.scalatest.funsuite.AnyFunSuite

/** Pinned allowlist + resolution behavior, ported case-for-case from
  * reference internal/trino/client_test.go:15-393. */
class AllowlistsSpec extends AnyFunSuite {

  // --- TestFilterCatalogs (client_test.go:15-76) ---
  test("filterCatalogs: no allowlist returns all") {
    assert(Allowlists().filterCatalogs(Seq("hive", "postgresql", "mysql")) ==
      Seq("hive", "postgresql", "mysql"))
  }
  test("filterCatalogs: filters to allowed") {
    assert(Allowlists(allowedCatalogs = Seq("hive", "postgresql"))
      .filterCatalogs(Seq("hive", "postgresql", "mysql", "oracle")) ==
      Seq("hive", "postgresql"))
  }
  test("filterCatalogs: case insensitive") {
    assert(Allowlists(allowedCatalogs = Seq("HIVE", "PostgreSQL"))
      .filterCatalogs(Seq("hive", "postgresql", "mysql")) ==
      Seq("hive", "postgresql"))
  }
  test("filterCatalogs: no matches") {
    assert(Allowlists(allowedCatalogs = Seq("nonexistent"))
      .filterCatalogs(Seq("hive", "postgresql", "mysql")).isEmpty)
  }
  test("filterCatalogs: partial matches") {
    assert(Allowlists(allowedCatalogs = Seq("hive"))
      .filterCatalogs(Seq("hive", "postgresql", "mysql")) == Seq("hive"))
  }

  // --- TestFilterSchemas (client_test.go:78-134) ---
  test("filterSchemas: no allowlist returns all") {
    assert(Allowlists().filterSchemas(Seq("analytics", "marts", "staging"), "hive") ==
      Seq("analytics", "marts", "staging"))
  }
  test("filterSchemas: filters to allowed") {
    assert(Allowlists(allowedSchemas = Seq("hive.analytics", "hive.marts"))
      .filterSchemas(Seq("analytics", "marts", "staging", "raw"), "hive") ==
      Seq("analytics", "marts"))
  }
  test("filterSchemas: case insensitive") {
    assert(Allowlists(allowedSchemas = Seq("HIVE.ANALYTICS", "hive.marts"))
      .filterSchemas(Seq("analytics", "marts", "staging"), "hive") ==
      Seq("analytics", "marts"))
  }
  test("filterSchemas: different catalog no matches") {
    assert(Allowlists(allowedSchemas = Seq("hive.analytics", "hive.marts"))
      .filterSchemas(Seq("public", "private"), "postgresql").isEmpty)
  }
  test("filterSchemas: mixed catalogs in allowlist") {
    assert(Allowlists(allowedSchemas = Seq("hive.analytics", "postgresql.public"))
      .filterSchemas(Seq("analytics", "marts"), "hive") == Seq("analytics"))
  }

  // --- TestFilterTables (client_test.go:136-193) ---
  test("filterTables: no allowlist returns all") {
    assert(Allowlists().filterTables(Seq("users", "events", "sessions"), "hive", "analytics") ==
      Seq("users", "events", "sessions"))
  }
  test("filterTables: filters to allowed") {
    assert(Allowlists(allowedTables = Seq("hive.analytics.users", "hive.analytics.events"))
      .filterTables(Seq("users", "events", "sessions", "temp"), "hive", "analytics") ==
      Seq("users", "events"))
  }
  test("filterTables: case insensitive") {
    assert(Allowlists(allowedTables = Seq("HIVE.ANALYTICS.USERS", "hive.analytics.events"))
      .filterTables(Seq("users", "events", "sessions"), "hive", "analytics") ==
      Seq("users", "events"))
  }
  test("filterTables: different catalog/schema no matches") {
    assert(Allowlists(allowedTables = Seq("hive.analytics.users"))
      .filterTables(Seq("orders", "customers"), "postgresql", "public").isEmpty)
  }

  // --- TestIsCatalogAllowed (client_test.go:195-227) ---
  {
    val a = Allowlists(allowedCatalogs = Seq("hive", "postgresql", "MySQL"))
    Seq("hive" -> true, "postgresql" -> true, "mysql" -> true, "MySQL" -> true,
      "HIVE" -> true, "oracle" -> false, "sqlserver" -> false, "" -> false)
      .foreach { case (c, expected) =>
        test(s"isCatalogAllowed($c) == $expected") {
          assert(a.isCatalogAllowed(c) == expected)
        }
      }
  }

  // --- TestIsSchemaAllowed (client_test.go:229-259) ---
  {
    val a = Allowlists(allowedSchemas = Seq("hive.analytics", "hive.marts", "PostgreSQL.PUBLIC"))
    Seq(("hive", "analytics", true), ("hive", "marts", true),
      ("postgresql", "public", true), ("PostgreSQL", "PUBLIC", true),
      ("hive", "staging", false), ("postgresql", "private", false),
      ("mysql", "analytics", false))
      .foreach { case (c, s, expected) =>
        test(s"isSchemaAllowed($c, $s) == $expected") {
          assert(a.isSchemaAllowed(c, s) == expected)
        }
      }
  }

  // --- TestIsTableAllowed (client_test.go:261-290) ---
  {
    val a = Allowlists(allowedTables =
      Seq("hive.analytics.users", "hive.marts.sales", "PostgreSQL.PUBLIC.ORDERS"))
    Seq(("hive", "analytics", "users", true),
      ("PostgreSQL", "PUBLIC", "ORDERS", true),
      ("hive", "analytics", "events", false),
      ("hive", "staging", "users", false),
      ("mysql", "analytics", "users", false),
      ("", "analytics", "users", false),
      ("hive", "", "users", false),
      ("hive", "analytics", "", false))
      .foreach { case (c, s, t, expected) =>
        test(s"isTableAllowed($c, $s, $t) == $expected") {
          assert(a.isTableAllowed(c, s, t) == expected)
        }
      }
  }

  // --- TestTableParameterResolution (client_test.go:292-341) ---
  test("resolution: default catalog applied") {
    assert(Allowlists.resolveTable("", "analytics", "users", "hive", "default") ==
      (("hive", "analytics", "users")))
  }
  test("resolution: schema.table format") {
    assert(Allowlists.resolveTable("", "", "analytics.users", "hive", "default") ==
      (("hive", "analytics", "users")))
  }
  test("resolution: fully qualified") {
    assert(Allowlists.resolveTable("", "", "hive.analytics.users", "hive", "default") ==
      (("hive", "analytics", "users")))
  }
  test("resolution: explicit params preserved") {
    assert(Allowlists.resolveTable("postgresql", "public", "orders", "hive", "default") ==
      (("postgresql", "public", "orders")))
  }

  // --- TestGetTableSchemaAllowlistLogic (client_test.go:343-393) ---
  {
    val a = Allowlists(allowedTables = Seq("hive.analytics.users", "hive.marts.sales"))
    def check(c: String, s: String, t: String): Boolean = {
      val (rc, rs, rt) = Allowlists.resolveTable(c, s, t, "hive", "default")
      a.isTableAllowed(rc, rs, rt)
    }
    test("allowlist after resolution: explicit works") {
      assert(check("hive", "analytics", "users"))
    }
    test("allowlist after resolution: default catalog works") {
      assert(check("", "analytics", "users"))
    }
    test("allowlist after resolution: schema.table works (bug fix)") {
      assert(check("", "", "analytics.users"))
    }
    test("allowlist after resolution: fully qualified works") {
      assert(check("", "", "hive.analytics.users"))
    }
    test("allowlist after resolution: not in allowlist denied") {
      assert(!check("hive", "analytics", "events"))
    }
    test("allowlist after resolution: wrong catalog denied") {
      assert(!check("postgresql", "analytics", "users"))
    }
  }

  test("tableAccessError: empty table allowlist never denies") {
    assert(Allowlists().tableAccessError("c", "s", "t").isEmpty)
  }
  test("tableAccessError: reference error text") {
    val a = Allowlists(allowedTables = Seq("hive.analytics.users"))
    assert(a.tableAccessError("hive", "analytics", "events") ==
      Some("table access denied: hive.analytics.events not in allowlist"))
  }
}
