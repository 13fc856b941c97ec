package graft.sources

import java.nio.file.{Files, Paths}
import java.util.Properties

/** Source/warehouse credential resolution (reference C1: the ingestion
  * and warehousing Lambdas fetch a JSON secret document with
  * host/port/dbname/username/password and build a connection from it —
  * /root/reference/src/ingestion_lambda.py:123-138,
  * /root/reference/src/warehousing_lambda.py:13-29).
  *
  * Spark-first mapping: the same JSON document, resolved through a
  * provider chain OUTSIDE the data plane and handed to the JDBC
  * reader/writer as properties. Providers, first hit wins:
  *
  *  1. an explicit in-process override (tests, embedded drivers);
  *  2. environment variables `GRAFT_DB_<NAME>_JSON` (the secret payload
  *     verbatim — how cluster secret mechanisms typically inject it);
  *  3. a JSON file at `GRAFT_SECRETS_DIR/<name>.json` (mounted secret
  *     volume — the file IS the secret-store payload).
  *
  * No secret material ever enters DataFrame code, logs, or state files;
  * the resolved object carries it straight into `Properties` for the
  * driver's JDBC handshake.
  */
object Secrets {

  /** The reference's secret document shape (C1). `url` is assembled the
    * same way the reference builds its connection string. */
  final case class DbSecret(
      host: String, port: String, dbname: String,
      username: String, password: String, engine: String = "postgresql") {
    def url: String = s"jdbc:$engine://$host:$port/$dbname"
    def properties: Properties = {
      val p = new Properties()
      p.setProperty("user", username)
      p.setProperty("password", password)
      p
    }
  }

  /** Parse the JSON secret document (string values only — the exact
    * shape the reference consumes), accepting BOTH delivery forms: the
    * flat object itself, and the reference's wrapped form where the flat
    * payload sits under a single top-level key (ingestion_lambda.py
    * reads `json.loads('{' + secret + '}')['crigglestone']`).
    * Escape-correct: a password containing `\"` or `{` parses to the
    * literal characters; anything outside those two shapes fails loudly
    * rather than yielding wrong credentials. Same codec contract as
    * WatermarkStore's state file (which stays strictly flat). */
  def parse(json: String): Map[String, String] = MiniJson.parseFlatOrWrapped(json)

  def fromJson(json: String): DbSecret = {
    val m = parse(json)
    def req(k: String): String =
      m.getOrElse(k, sys.error(s"secret document missing field '$k'"))
    DbSecret(req("host"), m.getOrElse("port", "5432"), req("dbname"),
      req("username"), req("password"), m.getOrElse("engine", "postgresql"))
  }

  /** Resolve the named secret through the provider chain. */
  def resolve(
      name: String,
      overrides: Map[String, DbSecret] = Map.empty,
      env: Map[String, String] = sys.env): DbSecret =
    overrides.get(name)
      .orElse(env.get(s"GRAFT_DB_${name.toUpperCase}_JSON").map(fromJson))
      .orElse(env.get("GRAFT_SECRETS_DIR").flatMap { dir =>
        val p = Paths.get(dir, s"$name.json")
        if (Files.isRegularFile(p)) Some(fromJson(Files.readString(p))) else None
      })
      .getOrElse(sys.error(
        s"no secret provider yielded '$name' (override, GRAFT_DB_${name.toUpperCase}_JSON, GRAFT_SECRETS_DIR)"))
}
