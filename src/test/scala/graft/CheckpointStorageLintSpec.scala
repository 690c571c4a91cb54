package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source lint pinning the checkpoint-storage invariant that bit
  * twice at the 30x data step (round 8: PageRank edges; round 9:
  * triangle orientation, then the BPE vocab / closure accumulator):
  *
  * eager `localCheckpoint(true)` defaults to DESERIALIZED row storage
  * — 5-10x the serialized footprint — and, unlike `persist`, the
  * blocks survive `spark.catalog.clearCache()` and pin heap for the
  * query's whole lifetime. A checkpoint that is harmless at sf0.1
  * becomes the OOM at 30x. The repo-wide rule is therefore uniform:
  * EVERY `localCheckpoint` in main sources passes an explicit
  * `StorageLevel.MEMORY_AND_DISK_SER` (directly or via a local `ser`
  * binding to it). On the handful of bounded tables (top-K rank
  * rows, m·k codebooks) the serialization cost is microseconds, so
  * uniformity is cheaper than a blessing mechanism that could rot.
  */
class CheckpointStorageLintSpec extends AnyFunSuite {

  private val root = Paths.get("src/main/scala")

  private def scalaFiles: Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq

  test("every localCheckpoint in main sources uses serialized storage") {
    val offenders = scalaFiles.flatMap { p =>
      val lines = Files.readAllLines(p).asScala.toVector
      val hasSerBinding = lines.exists(l =>
        l.contains("val ser =") || l.contains("val ser: StorageLevel"))
      val serBindingOk = lines.zipWithIndex.forall { case (l, i) =>
        !l.contains("val ser =") ||
          (l + lines.drop(i + 1).take(1).mkString)
            .contains("MEMORY_AND_DISK_SER")
      }
      lines.zipWithIndex.collect {
        // call sites only — skip comments and scaladoc mentions
        case (l, i) if l.contains(".localCheckpoint") &&
            !l.trim.startsWith("//") && !l.trim.startsWith("*") =>
          val window = lines.slice(i, math.min(i + 3, lines.length)).mkString(" ")
          val direct = window.contains("MEMORY_AND_DISK_SER")
          val viaBinding =
            window.matches(""".*localCheckpoint\s*\(\s*true\s*,\s*ser\s*\).*""") &&
              hasSerBinding && serBindingOk
          if (direct || viaBinding) None
          else Some(s"$p:${i + 1}: $l")
      }.flatten
    }
    assert(offenders.isEmpty,
      "localCheckpoint without StorageLevel.MEMORY_AND_DISK_SER — " +
        "deserialized checkpoints OOM corpus-scale steps (see scaladoc):\n" +
        offenders.mkString("\n"))
  }
}
