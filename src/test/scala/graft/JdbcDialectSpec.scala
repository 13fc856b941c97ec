package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, Driver, DriverManager, ResultSet, Statement}

import scala.collection.mutable

import graft.sources.Extract

/** The Postgres branch of the crash-atomic JDBC publish, EXECUTED.
  *
  * `publishJdbcStage` splits its rename DDL by dialect
  * (`RENAME TABLE` on Derby, `ALTER TABLE … RENAME TO` elsewhere); the
  * Derby side runs for real in JdbcLifecycleSpec, but zero egress rules
  * out a live Postgres, so until round 11 the ALTER branch had never
  * executed. This spec registers a RECORDING JDBC driver that accepts
  * `jdbc:postgresql:` URLs and mocks exactly the surface the publish
  * path touches (metadata table lookup, statement execution,
  * transactional DDL with commit/rollback), then drives the real code
  * through it and asserts the statement sequence, the stored-casing
  * resolution, and the transactional envelope — per dialect.
  */
class JdbcDialectSpec extends SparkSpec {

  /** One mock database: stored table names are EXACT-CASE (like both
    * Derby and Postgres metadata); DDL is transactional — statements
    * buffer against a working copy that only commit publishes. */
  private final class MockDb(initial: Set[String],
      val columns: Seq[String] = Seq("payment_id", "amount")) {
    val committed: mutable.Set[String] = mutable.Set(initial.toSeq: _*)
    var working: mutable.Set[String] = committed.clone()
    val executed: mutable.Buffer[String] = mutable.Buffer.empty
    var commits = 0
    var rollbacks = 0
    var autoCommit = true

    private val drop = """(?s)DROP TABLE "([^"]+)"""".r
    private val derbyRename = """(?s)RENAME TABLE "([^"]+)" TO "([^"]+)"""".r
    private val alterRename = """(?s)ALTER TABLE "([^"]+)" RENAME TO "([^"]+)"""".r
    private val deleteIn =
      """(?s)DELETE FROM "([^"]+)" WHERE "[^"]+" IN \(SELECT "[^"]+" FROM "([^"]+)"\)""".r
    private val insertSel =
      """(?s)INSERT INTO "([^"]+)" \([^)]+\) SELECT [^()]+ FROM "([^"]+)"""".r

    def execute(sql: String): Unit = {
      executed += sql
      sql match {
        case drop(t) =>
          require(working.remove(t), s"DROP of absent table $t")
        case derbyRename(from, to) =>
          require(working.remove(from), s"RENAME of absent table $from")
          working += to
        case alterRename(from, to) =>
          require(working.remove(from), s"ALTER RENAME of absent table $from")
          working += to
        case deleteIn(t, st) =>
          require(working.contains(t), s"DELETE on absent table $t")
          require(working.contains(st), s"DELETE subselect on absent table $st")
        case insertSel(t, st) =>
          require(working.contains(t), s"INSERT into absent table $t")
          require(working.contains(st), s"INSERT select from absent table $st")
        case other => sys.error(s"mock db: unsupported DDL $other")
      }
    }
    def commit(): Unit = {
      commits += 1; committed.clear(); committed ++= working
    }
    def rollback(): Unit = { rollbacks += 1; working = committed.clone() }
  }

  /** java.sql.* surface via dynamic proxies — only the methods the
    * publish path calls are meaningful; everything else returns a
    * benign default. */
  private def connectionFor(db: MockDb): Connection = {
    def proxy[T](cls: Class[T])(h: (Method, Array[AnyRef]) => AnyRef): T =
      Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
        new InvocationHandler {
          override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
            h(m, if (args == null) Array.empty else args)
        }).asInstanceOf[T]

    def default(m: Method): AnyRef = m.getReturnType match {
      case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
      case java.lang.Integer.TYPE => Integer.valueOf(0)
      case _ => null
    }

    def resultSet(rows: Int): ResultSet = {
      var remaining = rows
      proxy(classOf[ResultSet]) { (m, _) =>
        m.getName match {
          case "next" =>
            val has = remaining > 0; remaining -= 1; java.lang.Boolean.valueOf(has)
          case _ => default(m)
        }
      }
    }

    // Ordinal-cursor column metadata (for the named-column INSERT's
    // storedColumns read) — serves the db's column list in order.
    def columnsResultSet(cols: Seq[String]): ResultSet = {
      var idx = -1
      proxy(classOf[ResultSet]) { (m, _) =>
        m.getName match {
          case "next" => idx += 1; java.lang.Boolean.valueOf(idx < cols.size)
          case "getInt" => Integer.valueOf(idx + 1)
          case "getString" => cols(idx)
          case _ => default(m)
        }
      }
    }

    val meta = proxy(classOf[DatabaseMetaData]) { (m, args) =>
      m.getName match {
        // Exact-case match, as in real metadata catalogs: the caller's
        // resolveStoredName must find the stored casing by trying
        // variants, not by the mock being lenient.
        case "getTables" =>
          resultSet(if (db.committed.contains(args(2).asInstanceOf[String])) 1 else 0)
        case "getColumns" =>
          columnsResultSet(
            if (db.committed.contains(args(2).asInstanceOf[String])) db.columns
            else Seq.empty)
        case _ => default(m)
      }
    }

    val stmt = proxy(classOf[Statement]) { (m, args) =>
      m.getName match {
        case "executeUpdate" => db.execute(args(0).asInstanceOf[String]); Integer.valueOf(0)
        case _ => default(m)
      }
    }

    proxy(classOf[Connection]) { (m, args) =>
      m.getName match {
        case "setAutoCommit" => db.autoCommit = args(0).asInstanceOf[java.lang.Boolean]; null
        case "getAutoCommit" => java.lang.Boolean.valueOf(db.autoCommit)
        case "createStatement" => stmt
        case "getMetaData" => meta
        case "commit" => db.commit(); null
        case "rollback" => db.rollback(); null
        case "close" => null
        case _ => default(m)
      }
    }
  }

  /** A driver claiming `jdbc:postgresql:graftmock` — no real Postgres
    * driver is on the classpath, so DriverManager routes to it. */
  private object MockPgDriver extends Driver {
    @volatile var db: MockDb = _
    override def acceptsURL(url: String): Boolean =
      url.startsWith("jdbc:postgresql:graftmock")
    override def connect(url: String, info: java.util.Properties): Connection =
      if (acceptsURL(url)) connectionFor(db) else null
    override def getMajorVersion = 1
    override def getMinorVersion = 0
    override def getPropertyInfo(u: String, p: java.util.Properties) = Array.empty
    override def jdbcCompliant() = false
    override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException
  }
  DriverManager.registerDriver(MockPgDriver)

  private val pgUrl = "jdbc:postgresql:graftmock"
  private val props = new java.util.Properties()

  test("Postgres branch: ALTER TABLE … RENAME TO inside one DROP+RENAME transaction") {
    // Postgres-style stored casing: Spark's writer quotes identifiers,
    // so the stage survives lowercase; a live lowercase table exists.
    val db = new MockDb(Set("catalog__stage", "catalog"))
    MockPgDriver.db = db
    Extract.publishJdbcStage(pgUrl, "catalog", props)
    assert(db.executed.toList == List(
      """DROP TABLE "catalog"""",
      """ALTER TABLE "catalog__stage" RENAME TO "catalog""""),
      db.executed)
    assert(db.commits == 1 && db.committed == Set("catalog"),
      s"commits=${db.commits} tables=${db.committed}")
    assert(!db.autoCommit, "the publish must run under an explicit transaction")
  }

  test("Postgres branch: uppercase stored stage (unquoted DDL elsewhere) resolves and renames in-case") {
    // The rename target inherits the stage's stored casing — an
    // uppercase stage must rename to the uppercase live name, or
    // unquoted reads would miss it.
    val db = new MockDb(Set("CATALOG__STAGE"))
    MockPgDriver.db = db
    Extract.publishJdbcStage(pgUrl, "catalog", props)
    assert(db.executed.toList == List(
      """ALTER TABLE "CATALOG__STAGE" RENAME TO "CATALOG""""), db.executed)
    assert(db.committed == Set("CATALOG"))
  }

  test("Postgres branch: no stage => loud refusal, rollback, nothing changed") {
    val db = new MockDb(Set("catalog"))
    MockPgDriver.db = db
    val e = intercept[RuntimeException] {
      Extract.publishJdbcStage(pgUrl, "catalog", props)
    }
    assert(e.getMessage.contains("no stage table"), e.getMessage)
    assert(db.executed.isEmpty && db.commits == 0 && db.committed == Set("catalog"))
    assert(db.rollbacks >= 1, "an aborted publish must roll its transaction back")
  }

  test("Derby branch renders RENAME TABLE (the dialect split itself, same mock surface)") {
    // The real-Derby execution lives in JdbcLifecycleSpec; this pins
    // that a derby URL takes the OTHER branch of the split on the exact
    // same code path, so the two specs together cover both arms.
    val db = new MockDb(Set("CATALOG__STAGE", "CATALOG"))
    MockPgDriver.db = db
    // Register a second claim for a derby-ish mock URL.
    val derbyMock = new Driver {
      override def acceptsURL(url: String) = url.startsWith("jdbc:derby:graftmock")
      override def connect(url: String, info: java.util.Properties) =
        if (acceptsURL(url)) connectionFor(db) else null
      override def getMajorVersion = 1
      override def getMinorVersion = 0
      override def getPropertyInfo(u: String, p: java.util.Properties) = Array.empty
      override def jdbcCompliant() = false
      override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException
    }
    DriverManager.registerDriver(derbyMock)
    try {
      Extract.publishJdbcStage("jdbc:derby:graftmock", "catalog", props)
      assert(db.executed.toList == List(
        """DROP TABLE "CATALOG"""",
        """RENAME TABLE "CATALOG__STAGE" TO "CATALOG""""), db.executed)
      assert(db.committed == Set("CATALOG"))
    } finally DriverManager.deregisterDriver(derbyMock)
  }

  test("Postgres upsert: DELETE-by-pk + INSERT + DROP stage inside ONE transaction") {
    // The staged MERGE's commit half (r13): live table present, stage
    // fully written — the whole mutation must be one committed
    // transaction, and the stage must be gone afterwards.
    val db = new MockDb(Set("payment__stage", "payment"))
    MockPgDriver.db = db
    Extract.publishJdbcUpsert(pgUrl, "payment", "payment_id", props)
    assert(db.executed.toList == List(
      """DELETE FROM "payment" WHERE "payment_id" IN (SELECT "payment_id" FROM "payment__stage")""",
      """INSERT INTO "payment" ("payment_id", "amount") """ +
        """SELECT "payment_id", "amount" FROM "payment__stage"""",
      """DROP TABLE "payment__stage""""),
      db.executed)
    assert(db.commits == 1 && db.committed == Set("payment"),
      s"commits=${db.commits} tables=${db.committed}")
    assert(!db.autoCommit, "the upsert must run under an explicit transaction")
  }

  test("Postgres upsert: no live table => bootstrap rename, not a DELETE against nothing") {
    val db = new MockDb(Set("payment__stage"))
    MockPgDriver.db = db
    Extract.publishJdbcUpsert(pgUrl, "payment", "payment_id", props)
    assert(db.executed.toList == List(
      """ALTER TABLE "payment__stage" RENAME TO "payment""""), db.executed)
    assert(db.committed == Set("payment"))
  }

  test("Postgres upsert: no stage => loud refusal, rollback, nothing changed") {
    val db = new MockDb(Set("payment"))
    MockPgDriver.db = db
    val e = intercept[RuntimeException] {
      Extract.publishJdbcUpsert(pgUrl, "payment", "payment_id", props)
    }
    assert(e.getMessage.contains("no stage table"), e.getMessage)
    assert(db.executed.isEmpty && db.commits == 0 && db.committed == Set("payment"))
    assert(db.rollbacks >= 1)
  }
}
