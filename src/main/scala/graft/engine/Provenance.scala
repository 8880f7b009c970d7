package graft.engine

/** Run provenance for the self-records (BENCH_RESULT.json,
  * CORRECTNESS_SELF.json, the compact final stdout lines): git sha,
  * ISO-8601 UTC timestamp. Round-11 verdict item 6 — an empty driver
  * board previously took mtime archaeology to attribute; every record
  * now says which binary produced it and when.
  */
object Provenance {

  /** HEAD commit sha, best-effort. Tries `git rev-parse` first (cwd is
    * the repo root under `sbt run`), falls back to reading `.git/HEAD`
    * directly, then to "unknown" — provenance must never fail a run.
    */
  def gitSha(): String = {
    def viaCommand: Option[String] =
      try {
        import scala.sys.process._
        val out = Seq("git", "rev-parse", "HEAD").!!(ProcessLogger(_ => ()))
        Some(out.trim).filter(_.matches("[0-9a-f]{7,40}"))
      } catch { case _: Throwable => None }
    def viaFiles: Option[String] =
      try {
        import java.nio.file.{Files, Paths}
        import scala.jdk.CollectionConverters._
        val head = Files.readString(Paths.get(".git/HEAD")).trim
        if (head.startsWith("ref: ")) {
          val ref = head.stripPrefix("ref: ")
          val refFile = Paths.get(".git").resolve(ref)
          if (Files.exists(refFile)) Some(Files.readString(refFile).trim)
          else {
            val packed = Paths.get(".git/packed-refs")
            if (!Files.exists(packed)) None
            else Files.readAllLines(packed).asScala
              .find(_.endsWith(" " + ref)).map(_.split(" ")(0))
          }
        } else Some(head)
      } catch { case _: Throwable => None }
    viaCommand.orElse(viaFiles).getOrElse("unknown")
  }

  /** Current UTC instant, second precision (stable-width, sorts). */
  def nowIso(): String =
    java.time.Instant.now()
      .truncatedTo(java.time.temporal.ChronoUnit.SECONDS).toString

  /** First 16 hex chars of SHA-256 — fingerprints the full bench record
    * inside the compact stdout line so the two can be tied together. */
  def sha256Prefix(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }
}
