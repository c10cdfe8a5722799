ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkastreamsexamplespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output inherits sbt's stdout/stderr directly instead of going
// through the sbt logger: the driver parses Bench's one-line JSON from
// stdout, and the logger's "[info] " prefix broke that in round 1
// (BENCH_r01.json "parsed": null).
run / outputStrategy := Some(StdoutOutput)
// sbt's background-job service copies the full runtime classpath (all of
// /opt/spark/jars, ~400 MB) into a temp dir before every `runMain` — on
// this host that copy alone costs minutes (jstack: copyClasspath pinned in
// pwrite). The classpath is a read-only system dir; run from it directly.
bgCopyClasspath := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap cap: this host commits fresh memory pages pathologically slowly
// (measured: a 12 GiB -Xms+AlwaysPreTouch pre-touch took 4 min wall /
// 86 min sys). With a huge -Xmx, G1 keeps expanding the heap mid-query and
// each expansion is a multi-second page-commit stall charged to whichever
// query is running — the round-1 bench spent 330 s on a 25 s workload that
// way (GC log: 4-11.5 s young pauses exactly at capacity-growth points).
// The full suite runs in < 4 GiB live at sf0.1, so cap the forked heap at
// 8 GiB no matter what SPARK_DRIVER_MEM asks for; SPARK_GRAFT_HEAP_CAP
// overrides the cap if a future workload genuinely needs more.
val forkHeap: String = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  val cap = sys.env.getOrElse("SPARK_GRAFT_HEAP_CAP", "8g").trim.toLowerCase
  def mib(s: String): Option[Long] =
    try Some(s match {
      case x if x.endsWith("g") => x.dropRight(1).toLong * 1024
      case x if x.endsWith("m") => x.dropRight(1).toLong
      case x => x.toLong / (1024 * 1024)
    }) catch { case _: NumberFormatException => None }
  (mib(req), mib(cap)) match {
    case (Some(r), Some(c)) => if (r > c) cap else req
    case _ => "8g"
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$forkHeap",
) ++ sys.env.get("SPARK_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" ").toSeq)
