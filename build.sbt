ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"

// No "[success] Total time: ..." epilogue after `sbt run`: the bench
// harness captures only the LAST stdout chars and parses the FINAL line
// as JSON — sbt's success banner printed after graft.Bench's summary line
// is what made every prior round's artifact unparseable (parsed: null).
ThisBuild / showSuccess := false

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

// Scala 2 macro implementations must be compiled in a run that PRECEDES
// their expansion sites — an incremental build can mask this (stale
// classfiles satisfy the lookup), but a clean build fails. graft.typed's
// TypedMacros (TypedField.scala) therefore lives in its own subproject;
// scala-reflect ships with the Spark jars dir, so the same unmanagedBase
// covers it.
lazy val typedMacros = (project in file("typed-macros"))
  .settings(
    name := "edgyspark-typed-macros",
    unmanagedBase := file("/opt/spark/jars"),
  )

lazy val root = (project in file("."))
  .dependsOn(typedMacros)
  // aggregate so root-level clean/compile/test fan out to the macro
  // subproject — without it a "clean" build reuses stale typed-macros
  // classfiles, the exact masking effect the comment above warns about
  .aggregate(typedMacros)
  .settings(
    name := "edgyspark",
    // Spark jars ship with the image at /opt/spark/jars (zero-egress):
    unmanagedBase := file("/opt/spark/jars"),
    // Test-only deps resolve from the pre-warmed coursier cache; anything
    // else is intentionally not resolvable (COURSIER_MODE=offline).
    libraryDependencies ++= Seq(
      "org.scalatest" %% "scalatest" % "3.2.19" % Test,
      "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
    ),
    Test / fork := true,
    run / fork := true,
    // forked run output goes STRAIGHT to stdout — no "[info] " decoration
    // on the bench's final JSON line (a bare json.loads of the last line
    // must succeed; the [success] banner is already off, see showSuccess)
    run / outputStrategy := Some(OutputStrategy.StdoutOutput),
    javaOptions ++= jdk17AddOpens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
    ) ++
      // extra forked-JVM flags for measured experiments (GC flavor, GC
      // logging, heap shape) — space-separated, empty by default so the
      // driver's bench JVM is unchanged unless a run asks for it
      sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
        .flatMap(_.split("\\s+").filter(_.nonEmpty)),
  )
