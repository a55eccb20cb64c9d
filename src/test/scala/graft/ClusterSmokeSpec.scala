package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Drives [[ClusterSmoke]] in a CHILD JVM (one SparkContext per JVM;
  * the shared test session is local[4]) and compares every cluster
  * result bit-for-bit against the same query run on the local
  * session. Catches serialization bugs — non-serializable Aggregator
  * buffers, encoders that only work in-JVM — that the local[*] test
  * matrix structurally cannot. */
class ClusterSmokeSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  test("representative queries match local results on local-cluster[2,2,1024] (cross-JVM)") {
    val sf = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft_cluster_smoke").toString
    val java = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.ClusterSmoke", sf, out)
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    // the executor-launch command builder needs this when SPARK_HOME is
    // a plain dist without assembly build dirs
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    val proc = pb.start()
    // consume stdout fully BEFORE waitFor — a filled pipe deadlocks the child
    val log = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    proc.waitFor(10, TimeUnit.MINUTES) shouldBe true
    withClue("child log tail:\n" + log.takeRight(4000) + "\n") {
      proc.exitValue() shouldBe 0
      log should include ("[cluster-smoke] ALL OK")
    }
    ClusterSmoke.queryNames.foreach { name =>
      // toJSON: deterministic text form for every column type incl.
      // binary (base64) and arrays; rows sorted for order-free compare
      val cluster = spark.read.parquet(s"$out/$name").toJSON.collect().sorted
      val local = SparkEntry.queries(name)(spark, sf).toJSON.collect().sorted
      withClue(s"$name cluster-vs-local: ") { cluster shouldBe local }
    }
  }
}
