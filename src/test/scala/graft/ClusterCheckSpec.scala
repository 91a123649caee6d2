package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for [[ClusterCheck]]: spawns it in its own JVM (one SparkContext
  * per JVM — the suite's shared local[4] session can't coexist with a
  * local-cluster context) and requires exit 0 + the OK marker. This is
  * the `sbt test` hook that keeps executor-JVM serialization of every
  * custom expression/aggregate proven, not assumed. */
class ClusterCheckSpec extends AnyFunSuite {

  test("serialization-critical queries are identical on real executor JVMs") {
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cmd = Seq(javaBin) ++ graft.run.GraftSession.jdk17AddOpens ++ Seq(
      "-Xmx6g", "-cp", sys.props("java.class.path"),
      "graft.ClusterCheck", "/root/testdata/sf0.001")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val exit = p.waitFor()
    val tail = out.linesIterator.toSeq.takeRight(40).mkString("\n")
    assert(exit == 0, s"ClusterCheck exited $exit; tail:\n$tail")
    assert(out.contains("CLUSTERCHECK_OK"), s"marker missing; tail:\n$tail")
  }
}
