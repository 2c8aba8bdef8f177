package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.dialect.KsqlDialect.rewrite

/** Property tests for the dialect rewriter (SURVEY §5 item 4; runs under
  * sbt's native ScalaCheck framework — no Spark session needed).
  */
object DialectProps extends Properties("KsqlDialect") {

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val arrowPath: Gen[String] = for {
    parts <- Gen.nonEmptyListOf(ident).map(_.take(4))
  } yield parts.mkString("->")

  private val literal: Gen[String] = for {
    body <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('-'),
      Gen.const('>'), Gen.const(' '), Gen.const('.'))).map(_.mkString)
  } yield s"'$body'"

  property("string literals survive the rewrite verbatim") =
    Prop.forAll(literal, arrowPath) { (lit, path) =>
      val q = s"select $lit, $path from t where x = $lit"
      rewrite(q).contains(lit)
    }

  property("no arrow survives outside literals") =
    Prop.forAll(Gen.listOfN(3, arrowPath), literal) { (paths, lit) =>
      val q = s"select ${paths.mkString(", ")} from t where y = $lit"
      val out = rewrite(q)
      // strip literals, then no '->' may remain
      val stripped = out.replace(lit, "")
      !stripped.contains("->")
    }

  property("arrow rewrite is dot-join of the same identifiers") =
    Prop.forAll(arrowPath) { path =>
      rewrite(s"select $path from t") ==
        s"select ${path.replace("->", ".")} from t"
    }

  property("rewrite is idempotent") =
    Prop.forAll(arrowPath, literal) { (path, lit) =>
      val once = rewrite(s"select $path from t where not $path and x = $lit")
      rewrite(once) == once
    }

  property("NOT <path> becomes a falsiness test; NOT IN stays") =
    Prop.forAll(arrowPath) { path =>
      val dotted = path.replace("->", ".")
      val t1 = rewrite(s"where not $path") ==
        s"where (coalesce(cast($dotted as string), '') = '')"
      val t2 = rewrite(s"where $dotted not in (1)") ==
        s"where $dotted not in (1)"
      t1 && t2
    }
}
