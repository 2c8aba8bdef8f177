package graft

import java.nio.file.Files
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.sources.K8sSnapshot

/** Property test for the flatten T1 (SURVEY §5 item 4): over randomly
  * generated pod lists — containers arrays of varying length, status
  * arrays shorter/longer/absent, restartCount sometimes missing — the
  * invariants hold on BOTH the DSv2 and from_json load paths:
  *   1. container row count = Σ size(spec.containers)
  *   2. restarts is null exactly where the index-aligned status entry
  *      (or its restartCount) is absent.
  */
class FlattenPropertySpec extends SparkSpec {

  private case class GenPod(uid: String, nContainers: Int,
      statusLens: Option[Int], missingRestartAt: Set[Int])

  private val podGen: Gen[GenPod] = for {
    uid <- Gen.uuid.map(_.toString.take(8))
    n <- Gen.choose(0, 4)
    statusLen <- Gen.option(Gen.choose(0, 6))
    missing <- Gen.listOf(Gen.choose(0, 5)).map(_.toSet)
  } yield GenPod(uid, n, statusLen, missing)

  private def podJson(p: GenPod): String = {
    val containers = (0 until p.nContainers).map(i =>
      s"""{"name": "c$i", "image": "img-${p.uid}-$i"}""").mkString(",")
    val statuses = p.statusLens.map { len =>
      val entries = (0 until len).map { i =>
        if (p.missingRestartAt.contains(i))
          s"""{"name": "c$i", "ready": true}"""
        else s"""{"name": "c$i", "restartCount": $i, "ready": true}"""
      }.mkString(",")
      s""","containerStatuses": [$entries]"""
    }.getOrElse("")
    s"""{
       |  "metadata": {"name": "p-${p.uid}", "uid": "${p.uid}"},
       |  "spec": {"nodeName": "n1", "containers": [$containers]},
       |  "status": {"phase": "Running"$statuses}
       |}""".stripMargin
  }

  test("flatten invariants hold for generated pod lists on both loaders") {
    val samples = Gen.listOfN(8, podGen).sample.get
    val dir = Files.createTempDirectory("flatten-prop").toFile
    val file = new java.io.File(dir, "pods.json")
    Files.writeString(file.toPath,
      s"""{"items": [${samples.map(podJson).mkString(",")}]}""")

    for (useV2 <- Seq(true, false)) {
      val pods =
        if (useV2) spark.read.format("k8s-snapshot").option("kind", "pods")
          .load(file.getPath)
        else K8sSnapshot.pods(spark, file.getPath)
      val containers = K8sSnapshot.containers(pods)

      val expectedCount = samples.map(_.nContainers).sum
      assert(containers.count() == expectedCount, s"useV2=$useV2")

      val got = containers.collect()
        .map(r => (r.getString(1), r.getString(0),
          if (r.isNullAt(2)) None else Some(r.getInt(2))))
        .toSet
      val want = samples.flatMap { p =>
        (0 until p.nContainers).map { i =>
          val hasStatus = p.statusLens.exists(_ > i) &&
            !p.missingRestartAt.contains(i)
          (p.uid, s"img-${p.uid}-$i", if (hasStatus) Some(i) else None)
        }
      }.toSet
      assert(got == want, s"useV2=$useV2")
    }
  }
}
