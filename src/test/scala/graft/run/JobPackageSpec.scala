package graft.run

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** §2.I packaging analog vs the reference's GlueJob resource lifecycle
  * (etl.py:45-135,332-526,719-743; tests/test_tests.py:64-131 pins the
  * resource lists for tests/data/test_glue_job/). */
class JobPackageSpec extends AnyFunSuite {

  private def tmp(): Path = Files.createTempDirectory("graftpkg")

  private def touch(p: Path, content: String = "x"): Path = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  /** The reference's test fixture layout (tests/data/glue_jobs/simple_etl_job). */
  private def fixture(): (Path, Path) = {
    val root = tmp()
    val job = root.resolve("glue_jobs").resolve("simple_etl_job")
    touch(job.resolve("job.py"), "print('job')")
    touch(job.resolve("glue_py_resources").resolve("my_lib.py"))
    touch(job.resolve("glue_py_resources").resolve("notes.md")) // filtered out
    touch(job.resolve("glue_resources").resolve("query.sql"))
    touch(job.resolve("glue_jars").resolve("dep.jar"))
    touch(job.resolve("..").resolve("shared_job_resources")
      .resolve("glue_py_resources").resolve("shared_lib.py"))
    touch(job.resolve("..").resolve("shared_job_resources")
      .resolve("glue_resources").resolve("lookup.csv"))
    touch(root.resolve("meta_data").resolve("db1").resolve("teams.json"), "{}")
    (root, job)
  }

  test("job folder contract: missing job.py fails with the reference's message") {
    val root = tmp()
    Files.createDirectories(root.resolve("nojob"))
    val e = intercept[IllegalArgumentException](
      new JobPackage(root.resolve("nojob").toString, tmp().toString))
    assert(e.getMessage.contains("Could not find job.py in base directory provided"))
    assert(e.getMessage.contains("shared_job_resources"))
  }

  test("resource collection honors per-kind regexes and the shared merge") {
    val (_, job) = fixture()
    val pkg = new JobPackage(job.toString, tmp().toString)
    assert(pkg.jobName == "simple_etl_job") // basename default (etl.py:105-109)
    assert(pkg.pyResources.map(_.getFileName.toString) ==
      Seq("my_lib.py", "shared_lib.py")) // .md filtered, shared merged
    assert(pkg.resources.map(_.getFileName.toString) == Seq("query.sql", "lookup.csv"))
    assert(pkg.jars.map(_.getFileName.toString) == Seq("dep.jar"))
    val solo = new JobPackage(job.toString, tmp().toString,
      includeSharedJobResources = false)
    assert(solo.pyResources.map(_.getFileName.toString) == Seq("my_lib.py"))
    assert(solo.resources.map(_.getFileName.toString) == Seq("query.sql"))
  }

  test("duplicate basenames across job and shared resources are rejected") {
    val (_, job) = fixture()
    // same basename as the shared folder's file → flat staging would collide
    touch(job.resolve("glue_py_resources").resolve("shared_lib.py"))
    val pkg = new JobPackage(job.toString, tmp().toString)
    val e = intercept[IllegalArgumentException](pkg.syncToStage())
    assert(e.getMessage.contains("There are duplicate file names in your supplied resources"))
  }

  test("syncToStage stages the flat resource set plus the meta_data tree") {
    val (_, job) = fixture()
    val stage = tmp()
    val pkg = new JobPackage(job.toString, stage.toString, jobId = "42")
    val staged = pkg.syncToStage()
    val base = stage.resolve("_GraftJobs_").resolve("simple_etl_job")
      .resolve("42").resolve("resources")
    val expected = Seq("my_lib.py", "shared_lib.py", "query.sql", "lookup.csv",
      "dep.jar", "job.py").map(base.resolve)
    expected.foreach(p => assert(Files.exists(p), s"missing staged $p"))
    // metadata keeps its path relative to meta_data/ (etl.py:514-519)
    assert(Files.exists(base.resolve("meta_data").resolve("db1").resolve("teams.json")))
    assert(staged.size == expected.size + 1)
    // job arguments point at the staged metadata (etl.py:186-190)
    assert(pkg.jobArguments()("--metadata_base_path") ==
      base.resolve("meta_data").toString)
    val bad = intercept[IllegalArgumentException](
      pkg.jobArguments(Map("--mode" -> "dev")))
    assert(bad.getMessage.contains("Found incorrect job argument"))
    // re-sync wipes and restages (etl.py:505 deletes the tmp folder first)
    val again = pkg.syncToStage()
    assert(again.size == staged.size)
  }

  test("github zipball unnesting strips the single top-level folder") {
    val (_, job) = fixture()
    // build a github-shaped zipball: everything under repo-master/
    val zipPath = tmp().resolve("mylib.zip")
    val zout = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
    Seq("repo-master/", "repo-master/mylib/", "repo-master/mylib/__init__.py",
      "repo-master/setup.py").foreach { n =>
      zout.putNextEntry(new java.util.zip.ZipEntry(n))
      if (!n.endsWith("/")) zout.write("code".getBytes)
      zout.closeEntry()
    }
    zout.close()
    touch(job.resolve("glue_py_resources").resolve("github_zip_urls.txt"),
      s"short\n$zipPath\n") // <=10-char entries dropped (etl.py:365)
    val stage = tmp()
    val pkg = new JobPackage(job.toString, stage.toString, jobId = "7")
    assert(pkg.githubZipRefs == Seq(zipPath.toString))
    pkg.syncToStage()
    val stagedZip = stage.resolve("_GraftJobs_").resolve("simple_etl_job")
      .resolve("7").resolve("resources").resolve("mylib_new.zip")
    assert(Files.exists(stagedZip))
    val zin = new java.util.zip.ZipInputStream(Files.newInputStream(stagedZip))
    val names = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .map(_.getName).toList
    zin.close()
    assert(names.sorted == List("mylib/__init__.py", "setup.py"))
    // the intermediate rezip next to the source is cleaned up (etl.py:521-525)
    assert(!Files.exists(zipPath.getParent.resolve("mylib_new.zip")))
  }

  test("zip refs resolve through the pluggable fetch hook; file:// spec via the default") {
    val (_, job) = fixture()
    def mkZip(dir: java.nio.file.Path, name: String): java.nio.file.Path = {
      val p = dir.resolve(name)
      val zout = new java.util.zip.ZipOutputStream(Files.newOutputStream(p))
      Seq("repo-main/", s"repo-main/$name.py").foreach { n =>
        zout.putNextEntry(new java.util.zip.ZipEntry(n))
        if (!n.endsWith("/")) zout.write("code".getBytes)
        zout.closeEntry()
      }
      zout.close(); p
    }
    // default fetch: a file:// URL spec resolves like a plain path
    val local = mkZip(tmp(), "viaurl.zip")
    touch(job.resolve("glue_py_resources").resolve("github_zip_urls.txt"),
      s"file://$local\n")
    val stage1 = tmp()
    val p1 = new JobPackage(job.toString, stage1.toString, jobId = "11")
    p1.syncToStage()
    assert(Files.exists(stage1.resolve("_GraftJobs_").resolve("simple_etl_job")
      .resolve("11").resolve("resources").resolve("viaurl_new.zip")))
    // custom hook: a remote-shaped ref resolves through the injected
    // fetch (the etl.py:457-476 download step's injection point) — the
    // hook "downloads" by materializing a zip for the requested ref
    val store = tmp()
    val fetched = scala.collection.mutable.ArrayBuffer[String]()
    touch(job.resolve("glue_py_resources").resolve("github_zip_urls.txt"),
      "https://github.test/org/repo/zipball/main\n")
    val stage2 = tmp()
    val p2 = new JobPackage(job.toString, stage2.toString, jobId = "12",
      fetchZip = { ref => fetched += ref; mkZip(store, "fetched.zip") })
    p2.syncToStage()
    assert(fetched.toList == List("https://github.test/org/repo/zipball/main"))
    assert(Files.exists(stage2.resolve("_GraftJobs_").resolve("simple_etl_job")
      .resolve("12").resolve("resources").resolve("fetched_new.zip")))
  }

  test("cleanup removes the staged job; deleteStageFolder only this run") {
    val (_, job) = fixture()
    val stage = tmp()
    val run1 = new JobPackage(job.toString, stage.toString, jobId = "1")
    val run2 = new JobPackage(job.toString, stage.toString, jobId = "2")
    run1.syncToStage(); run2.syncToStage()
    run1.deleteStageFolder()
    assert(!Files.exists(stage.resolve("_GraftJobs_").resolve("simple_etl_job").resolve("1")))
    assert(Files.exists(stage.resolve("_GraftJobs_").resolve("simple_etl_job").resolve("2")))
    run2.cleanup()
    assert(!Files.exists(stage.resolve("_GraftJobs_").resolve("simple_etl_job")))
    run2.cleanup() // idempotent
  }
}
