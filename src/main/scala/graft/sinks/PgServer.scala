package graft.sinks

/** Throwaway local PostgreSQL bootstrap — ONE instance per JVM, lazily
  * initdb'd into a temp dir, unix-socket only (no TCP), trust auth,
  * torn down by a shutdown hook. This is what lets the reference's
  * actual target engine (db.rs loads into live Postgres) sit behind a
  * GATED query (`etl_pg_roundtrip`) and the live acceptance specs
  * instead of only golden bytes: the container ships server binaries
  * (r11), and bootstrap costs ~1-2 s once per JVM.
  *
  * Privilege dance: postgres refuses to run as root, so under a root
  * JVM every server-side command runs as `nobody` via su; the JVM
  * itself (root) connects through the socket unimpeded. Non-root JVMs
  * run the server as themselves. initdb pins UTF-8 + C.UTF-8 — the
  * container's POSIX default would otherwise create a SQL_ASCII
  * database that mangles multibyte text (r11 lesson).
  */
object PgServer {

  final case class Live(socketDir: String, port: Int, db: String, user: String) {
    /** URL accepted by [[PgWire.parse]] / [[PgCopySink.write]]. */
    def url: String =
      s"jdbc:postgresql://localhost:$port/$db?user=$user&socketDir=$socketDir"
    def target: PgWire.Target = PgWire.parse(url)
  }

  val PgBin = "/usr/lib/postgresql/15/bin"

  def binariesPresent: Boolean = new java.io.File(s"$PgBin/initdb").exists

  /** Explicit UTF-8 decode of child output: sys.process would decode
    * with the platform charset and mangle multibyte under the
    * container's POSIX locale. */
  private def sh(cmd: String): (Int, String) = {
    val pb = new java.lang.ProcessBuilder("sh", "-c", cmd)
    pb.directory(new java.io.File("/tmp"))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val bytes = p.getInputStream.readAllBytes()
    val code = p.waitFor()
    (code, new String(bytes, "UTF-8"))
  }

  private lazy val boot: Either[String, Live] = doBoot()

  /** The per-JVM instance, or the reason it could not come up (callers
    * gate on this: specs cancel, the gated query fails loudly). */
  def instance: Either[String, Live] = boot

  /** Run a server-side command as the unprivileged server user. Public
    * to the package so PgLiveSpec can drive pg_ctl reload etc. against
    * the shared instance. */
  private[graft] def asServerUser(cmd: String): (Int, String) =
    if (runAsNobody) sh(s"su -s /bin/sh nobody -c '$cmd'") else sh(cmd)

  private def runAsNobody: Boolean =
    sys.props.getOrElse("user.name", "") == "root"

  /** Data dir of the live instance (for pg_hba edits in specs). */
  @volatile private[graft] var dataDir: String = _

  private def doBoot(): Either[String, Live] = {
    if (!binariesPresent)
      return Left(s"no postgresql server binaries at $PgBin")
    val user = if (runAsNobody) "nobody" else sys.props.getOrElse("user.name", "nobody")
    val base = java.nio.file.Files.createTempDirectory("graft_pglive")
    val data = s"$base/data"
    val sock = s"$base/sock"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(sock))
    if (runAsNobody) sh(s"chmod 755 $base && chown $user $base $sock")
    val (ic, io) = asServerUser(
      s"$PgBin/initdb -D $data --no-sync -A trust -E UTF8 --locale=C.UTF-8")
    if (ic != 0) return Left(s"initdb failed: ${io.takeRight(300)}")
    // throwaway instance: durability off (fsync) — the store dies with
    // the JVM by design; socket-only, never a TCP port to collide on
    // port pinned explicitly: an inherited PGPORT env var would
    // otherwise make the server create .s.PGSQL.$PGPORT while every
    // client looks for .s.PGSQL.5432 (boot "succeeds", connects fail)
    val (sc, so) = asServerUser(
      s"$PgBin/pg_ctl -D $data -o \"-k $sock -c port=5432 -c listen_addresses= -c fsync=off\" " +
        s"-l $base/log -w start")
    if (sc != 0) return Left(s"server start failed: ${so.takeRight(300)}")
    dataDir = data
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      asServerUser(s"$PgBin/pg_ctl -D $data -m immediate stop")
      sh(s"rm -rf $base")
      ()
    }))
    Right(Live(sock, 5432, "postgres", user))
  }
}
