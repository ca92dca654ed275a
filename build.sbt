ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "proteusenginespark"
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
// The bench/verify drivers parse the process stdout: the forked JVM's
// streams must pass through UNDECORATED (no "[info] " prefix) and no
// "[success] Total time..." trailer may follow the JSON line, or the
// driver's stdout-tail parse fails (BENCH_r03 recorded parsed=null).
run / connectInput := false
Compile / run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
// Scratch placement (optimization r13, guide §5/§6): streaming state
// checkpoints, staged fixture copies and shuffle spill all live under
// java.io.tmpdir; on this box /tmp is disk-backed and the state-store
// commit path is fsync/rename-heavy — measured stream_asof_join 7.2 s →
// 3.1 s and stream_allowed_lateness 3.7 s → 2.4 s warm just by moving
// tmpdir to tmpfs. Production clusters put exactly this scratch on local
// NVMe/ramdisk; the sandbox equivalent is /dev/shm. Overridable via
// SPARK_GRAFT_SCRATCH; falls back to the system tmpdir when the tmpfs
// root is missing or read-only (portability — nothing here is
// load-bearing for correctness, scratch is recreated per run).
// MEMORY-PRESSURE CAVEAT (advisor, r13): tmpfs competes with the JVM heap
// for the same RAM, so shuffle spill-to-tmpfs defeats spilling under real
// memory pressure — on a memory-constrained run set SPARK_GRAFT_SCRATCH=/tmp
// (the escape hatch) or point spark.local.dir at disk; the sandbox bench
// (8g heap, 128 GiB box, ~MBs of spill) is nowhere near that regime.
val graftScratch: Option[String] = {
  val want = sys.env.get("SPARK_GRAFT_SCRATCH").orElse {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-scratch") else None
  }
  want.flatMap { p =>
    val d = new java.io.File(p)
    if (d.isDirectory || d.mkdirs()) Some(d.getAbsolutePath) else None
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ graftScratch.map(p => s"-Djava.io.tmpdir=$p").toSeq
