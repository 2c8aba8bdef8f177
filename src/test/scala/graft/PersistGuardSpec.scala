package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural guard for the lazy-persist rule (CLAUDE.md; recurred in
  * dd20, ss20, mm13 and the star-CC loop before being automated here):
  * any intermediate consumed more than once — by concurrent consumers
  * OR by multiple references inside one plan — must be EAGERLY
  * materialized with `localCheckpoint()`, because a lazy `persist()`
  * re-runs the build per reference before the cache fills.
  *
  * Enforcement: every remaining `.persist()` in main sources must carry
  * a `lazy-ok:` justification ON ITS LINE (measured A/B rejection,
  * constant-size input, or loop-carried single-reference shape). A bare
  * `.persist()` fails this suite, so the lesson cannot silently regress
  * when new operators land.
  */
class PersistGuardSpec extends AnyFunSuite {

  /** Offending `file:line` entries: `.persist()` without a non-vacuous
    * `lazy-ok:` tag on the same line. */
  private[graft] def offenders(sources: Map[String, String]): Seq[String] =
    sources.toSeq.sortBy(_._1).flatMap { case (name, text) =>
      text.split("\n", -1).zipWithIndex.collect {
        case (line, i) if line.contains(".persist(") && {
          val tagIdx = line.indexOf("lazy-ok:")
          tagIdx < 0 || line.substring(tagIdx + 8).trim.length < 10
        } => s"$name:${i + 1}"
      }
    }

  private def mainSources(): Map[String, String] = {
    val root = new java.io.File("src/main/scala/graft")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    walk(root).map { f =>
      f.getPath -> new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    }.toMap
  }

  test("guard is RED on a bare lazy persist (self-test)") {
    val bad = Map("Fixture.scala" ->
      """val x = df.withColumn("n", norm(col("e")))
        |  .persist() // reused by both join sides
        |x.join(x, "id")""".stripMargin)
    assert(offenders(bad) == Seq("Fixture.scala:2"))
    // a vacuous tag is also red
    val vacuous = Map("Fixture.scala" -> "df.persist() // lazy-ok: yes")
    assert(offenders(vacuous) == Seq("Fixture.scala:1"))
    // a justified tag passes
    val ok = Map("Fixture.scala" ->
      "df.persist() // lazy-ok: constant-size 5-row bench set")
    assert(offenders(ok).isEmpty)
  }

  test("every lazy persist in main sources carries a lazy-ok justification") {
    val srcs = mainSources()
    assert(srcs.nonEmpty, "test must run from the repo root")
    val bad = offenders(srcs)
    assert(bad.isEmpty,
      s"bare lazy persist() — either localCheckpoint() it (the dd20/ss20 " +
        s"rule) or record why lazy is safe with a 'lazy-ok:' line tag: " +
        bad.mkString(", "))
  }

  test("eager checkpoints never carry a stale lazy-ok tag") {
    val stale = mainSources().toSeq.flatMap { case (name, text) =>
      text.split("\n", -1).zipWithIndex.collect {
        case (line, i)
          if line.contains("localCheckpoint(") && line.contains("lazy-ok:")
          => s"$name:${i + 1}"
      }
    }
    assert(stale.isEmpty, s"lazy-ok tag on an eager checkpoint: $stale")
  }
}
