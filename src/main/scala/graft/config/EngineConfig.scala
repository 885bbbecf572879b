package graft.config

/** Env-driven engine configuration, ported from the reference's
  * NewTrinoConfigWithVersion (reference internal/config/config.go:58-228)
  * with identical variable names, defaults, validation and error
  * messages. Connection/TLS/OAuth variables are parsed for
  * compatibility but are N/A for an embedded Spark engine (there is no
  * remote coordinator to dial); they are retained so a reference
  * deployment's environment keeps validating identically.
  *
  * Deviation: default catalog is `spark_catalog` (Spark's session
  * catalog) where the reference defaults to Trino's `memory` connector —
  * the embedded engine's in-memory views live in the session catalog.
  */
final case class EngineConfig(
    host: String,
    port: Int,
    user: String,
    catalog: String,
    schema: String,
    queryTimeoutSeconds: Int,
    allowWriteQueries: Boolean,
    allowedCatalogs: Seq[String],
    allowedSchemas: Seq[String],
    allowedTables: Seq[String],
    enableImpersonation: Boolean,
    impersonationField: String,
    source: String,
    externalAuth: Boolean,
    externalAuthTimeout: Int,
    maxResultRows: Int,
    oauthEnabled: Boolean = false,
    oauthMode: String = "native",
    oauthProvider: String = "hmac",
    oauthHmacSecret: String = "",
    oidcIssuer: String = "",
    oidcAudience: String = "",
    oidcClientId: String = "",
    oidcClientSecret: String = "",
    oauthRedirectUris: Seq[String] = Nil,
    oidcJwks: String = "",
    oidcJwksFile: String = "",
    /** Opt-in hardening beyond the reference: apply the allowlists to
      * every relation inside execute_query SQL (security.SqlAllowlist).
      * Default false = reference parity (allowlists scope metadata
      * only). */
    enforceSqlAllowlists: Boolean = false)

object EngineConfig {

  val DefaultQueryTimeout = 30
  val DefaultExternalAuthTimeout = 300
  /** Row cap on collected results — embedded-engine addition (the
    * reference relies on the query timeout alone; an in-process engine
    * must also bound driver memory, SURVEY.md §4 custom piece 3). */
  val DefaultMaxResultRows = 10000

  def fromEnv(env: Map[String, String] = sys.env,
      version: String = "dev"): Either[String, EngineConfig] = {
    def get(k: String, d: String) = env.get(k).filter(_.nonEmpty).getOrElse(d)

    val timeout = {
      val raw = get("TRINO_QUERY_TIMEOUT", DefaultQueryTimeout.toString)
      raw.toIntOption match {
        case Some(t) if t > 0 => t
        case _ => DefaultQueryTimeout
      }
    }
    val extAuthTimeout = {
      val raw = get("TRINO_EXTERNAL_AUTH_TIMEOUT", DefaultExternalAuthTimeout.toString)
      raw.toIntOption match {
        case Some(t) if t > 0 => t
        case _ => DefaultExternalAuthTimeout
      }
    }
    val maxRows = {
      val raw = get("GRAFT_MAX_RESULT_ROWS", DefaultMaxResultRows.toString)
      raw.toIntOption match {
        case Some(t) if t > 0 => t
        case _ => DefaultMaxResultRows
      }
    }

    val allowedCatalogs = parseAllowlist(get("TRINO_ALLOWED_CATALOGS", ""))
    val allowedSchemas = parseAllowlist(get("TRINO_ALLOWED_SCHEMAS", ""))
    val allowedTables = parseAllowlist(get("TRINO_ALLOWED_TABLES", ""))

    val impersonationField = get("TRINO_IMPERSONATION_FIELD", "username").toLowerCase
    val source = {
      val s = get("TRINO_SOURCE", s"mcp-trino/$version")
      if (s.isEmpty) s"mcp-trino/$version" else s
    }

    for {
      _ <- validateAllowlist("TRINO_ALLOWED_SCHEMAS", allowedSchemas, 1)
      _ <- validateAllowlist("TRINO_ALLOWED_TABLES", allowedTables, 2)
      _ <-
        if (Set("username", "email", "subject")(impersonationField)) Right(())
        else Left(s"invalid TRINO_IMPERSONATION_FIELD '$impersonationField'. " +
          "Supported fields: username, email, subject")
    } yield EngineConfig(
      host = get("TRINO_HOST", "localhost"),
      port = get("TRINO_PORT", "8080").toIntOption.getOrElse(8080),
      user = get("TRINO_USER", "trino"),
      catalog = get("TRINO_CATALOG", "spark_catalog"),
      schema = get("TRINO_SCHEMA", "default"),
      queryTimeoutSeconds = timeout,
      allowWriteQueries =
        get("TRINO_ALLOW_WRITE_QUERIES", "false").toBooleanOption.getOrElse(false),
      enforceSqlAllowlists =
        get("GRAFT_ENFORCE_SQL_ALLOWLISTS", "false").toBooleanOption.getOrElse(false),
      allowedCatalogs = allowedCatalogs,
      allowedSchemas = allowedSchemas,
      allowedTables = allowedTables,
      enableImpersonation =
        get("TRINO_ENABLE_IMPERSONATION", "false").toBooleanOption.getOrElse(false),
      impersonationField = impersonationField,
      source = source,
      externalAuth = get("TRINO_EXTERNAL_AUTH", "false").toBooleanOption.getOrElse(false),
      externalAuthTimeout = extAuthTimeout,
      maxResultRows = maxRows,
      // OAUTH_ENABLED is the single source of truth (config.go:70-73);
      // mode/provider lowercased, detailed validation delegated to the
      // transport layer exactly like the reference delegates to its
      // oauth middleware (invalid values parse fine — oauth_test.go).
      oauthEnabled = get("OAUTH_ENABLED", "false").toBooleanOption.getOrElse(false),
      oauthMode = get("OAUTH_MODE", "native").toLowerCase,
      oauthProvider = get("OAUTH_PROVIDER", "hmac").toLowerCase,
      // JWT_SECRET is the reference name (config.go:74); the pre-r8
      // OAUTH_HMAC_SECRET alias is kept for compatibility.
      oauthHmacSecret = get("JWT_SECRET", get("OAUTH_HMAC_SECRET", "")),
      // OIDC provider configuration (config.go:75-80). OIDC_AUDIENCE
      // deliberately has no default — must be explicit (config.go:79).
      oidcIssuer = get("OIDC_ISSUER", ""),
      oidcAudience = get("OIDC_AUDIENCE", ""),
      oidcClientId = get("OIDC_CLIENT_ID", ""),
      oidcClientSecret = get("OIDC_CLIENT_SECRET", ""),
      // OAUTH_ALLOWED_REDIRECT_URIS, with the deprecated singular
      // OAUTH_REDIRECT_URI as fallback (config.go:160-168).
      oauthRedirectUris = parseAllowlist(
        get("OAUTH_ALLOWED_REDIRECT_URIS", get("OAUTH_REDIRECT_URI", ""))),
      // Embedded-engine extension: fixed JWKS for zero-egress
      // deployments (inline JSON wins over file; empty = issuer
      // discovery over HTTP like the reference's middleware).
      oidcJwks = get("OIDC_JWKS", ""),
      oidcJwksFile = get("OIDC_JWKS_FILE", ""))
  }

  /** Comma-split, trim, drop empties (config.go:231-246). */
  def parseAllowlist(value: String): Seq[String] =
    if (value.isEmpty) Nil
    else value.split(",", -1).iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Dot-count validation, fail-fast with the reference's exact error
    * text (config.go:249-258). */
  def validateAllowlist(envVar: String, allowlist: Seq[String],
      expectedDots: Int): Either[String, Unit] = {
    allowlist.foreach { item =>
      val dots = item.count(_ == '.')
      if (dots != expectedDots)
        return Left(s"invalid format in $envVar: '$item' " +
          s"(expected $expectedDots dots, found $dots)")
    }
    Right(())
  }
}
