package graft

import graft.sources.Secrets
import graft.sources.Secrets.DbSecret
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** C1: credential resolution through the provider chain, including the
  * secret-file provider (the mounted-volume shape) and the env-payload
  * provider, with the reference's JSON document format. */
class SecretsSpec extends AnyFunSuite {

  private val doc =
    """{"host": "db.internal", "port": "5433", "dbname": "totesys",
      |"username": "ops", "password": "s3cret"}""".stripMargin

  test("JSON secret document parses to url + properties") {
    val s = Secrets.fromJson(doc)
    assert(s.url == "jdbc:postgresql://db.internal:5433/totesys")
    assert(s.properties.getProperty("user") == "ops")
    assert(s.properties.getProperty("password") == "s3cret")
  }

  test("missing required field fails loudly") {
    val e = intercept[RuntimeException](Secrets.fromJson("""{"host": "h"}"""))
    assert(e.getMessage.contains("missing field"))
  }

  test("provider chain: override > env payload > secrets dir; absent -> error") {
    val dir = Files.createTempDirectory("graft_secrets")
    Files.writeString(dir.resolve("warehouse.json"), doc)
    val env = Map(
      "GRAFT_DB_SOURCE_JSON" -> doc.replace("totesys", "envdb"),
      "GRAFT_SECRETS_DIR" -> dir.toString)

    val over = DbSecret("o", "1", "odb", "u", "p")
    assert(Secrets.resolve("source", Map("source" -> over), env) == over)
    assert(Secrets.resolve("source", env = env).dbname == "envdb")
    assert(Secrets.resolve("warehouse", env = env).dbname == "totesys")
    val e = intercept[RuntimeException](Secrets.resolve("nope", env = env))
    assert(e.getMessage.contains("no secret provider"))
  }

  test("resolved secret drives a real JDBC handshake (embedded Derby)") {
    // Derby's in-memory engine stands in for Postgres (its embedded URL
    // scheme has no host/port, so the URL is built directly): the point
    // is that the PROPERTIES produced by the secret object are what the
    // Spark JDBC path consumes, with no credential material elsewhere.
    val s = DbSecret("unused", "0", "unused", "app", "app")
    val url = "jdbc:derby:memory:graftsec;create=true"
    val props = s.properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val spark = SparkSpec.session
    import spark.implicits._
    graft.sources.Extract.jdbcOverwrite(
      Seq((1, "x")).toDF("id", "v"), url, "sec_t", props)
    assert(graft.sources.Extract.jdbc(spark, url, "sec_t", props).count() == 1)
  }
}
