package graft.run

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Local job-packaging analog of the reference's GlueJob resource lifecycle
  * (`etl_manager/etl.py:45-135` folder contract, `etl.py:332-526` resource
  * collection + sync, `etl.py:719-743` cleanup). The S3 bucket becomes a
  * local staging root; everything else — the folder contract, the per-kind
  * filename regexes, the shared-resources merge, the duplicate-basename
  * check, the github zipball unnesting, and the staged layout
  * `_GraftJobs_/<name>/<id>/resources[/meta_data/...]` — mirrors the
  * reference's semantics (and error messages) one-for-one.
  *
  * Scale note: packaging is driver-side by nature (it stages a few script/
  * config files before a cluster submit); no Spark work happens here.
  */
final class JobPackage(
    jobFolder0: String,
    val stageRoot: String,
    jobNameOverride: Option[String] = None,
    val jobId: String = "0",
    val includeSharedJobResources: Boolean = true,
    fetchZip: String => Path = JobPackage.localFetch) {

  /** Folder contract (etl.py:45-74):
    * {{{
    * job_folder/
    *   job.py
    *   glue_py_resources/   *.py *.zip + github_zip_urls.txt
    *   glue_resources/      *.sql *.json *.csv *.txt
    *   glue_jars/           *.jar
    * <parent>/shared_job_resources/   same three folders, merged when
    *                                  includeSharedJobResources
    * }}} */
  // absolute so the parent/grandparent walk (shared resources, meta_data)
  // is always defined — a bare relative "myjob" has getParent == null
  val jobFolder: Path = Paths.get(jobFolder0).toAbsolutePath.normalize()

  /** etl.py:158-160. */
  val jobPath: Path = jobFolder.resolve("job.py")

  if (!Files.exists(jobPath))
    throw new IllegalArgumentException(
      s"Could not find job.py in base directory provided ($jobFolder), " +
        "stopping.\nOnly folder allowed to have no job.py is a folder named " +
        "shared_job_resources")

  /** Default job name = folder basename (etl.py:105-109). */
  val jobName: String =
    jobNameOverride.getOrElse(jobFolder.getFileName.toString)

  def jobParentFolder: Path =
    Option(jobFolder.getParent).getOrElse(jobFolder)

  def etlRootFolder: Path =
    Option(jobParentFolder.getParent).getOrElse(jobParentFolder)

  private def sharedFolder(kind: String): Path =
    jobParentFolder.resolve("shared_job_resources").resolve(kind)

  /** `_list_folder_with_regex` (etl.py:370-377): anchored match on the
    * filename, sorted for determinism. */
  private def listFolderWithRegex(folder: Path, regex: String): Seq[Path] = {
    if (!Files.isDirectory(folder)) return Seq.empty
    val st = Files.list(folder)
    try st.iterator().asScala
      .filter(p => p.getFileName.toString.matches(regex))
      .toSeq.sortBy(_.getFileName.toString)
    finally st.close()
  }

  private def collect(kind: String, regex: String): Seq[Path] = {
    val own = listFolderWithRegex(jobFolder.resolve(kind), regex)
    val shared =
      if (includeSharedJobResources) listFolderWithRegex(sharedFolder(kind), regex)
      else Seq.empty
    own ++ shared
  }

  /** etl.py:379-400: `.py`/`.zip` under glue_py_resources. */
  def pyResources: Seq[Path] = collect("glue_py_resources", ".+(\\.py|\\.zip)$")

  /** etl.py:402-422: `.sql`/`.json`/`.csv`/`.txt` under glue_resources. */
  def resources: Seq[Path] =
    collect("glue_resources", ".+(\\.sql|\\.json|\\.csv|\\.txt)$")

  /** etl.py:424-444: `.jar` under glue_jars. */
  def jars: Seq[Path] = collect("glue_jars", ".+(\\.jar)$")

  /** etl.py:342-368: github zipball references from github_zip_urls.txt in
    * the job + shared py-resource folders; entries shorter than the
    * reference's len>10 sanity floor are dropped. In this engine they must
    * resolve to LOCAL zip files (no network egress at package time); each
    * is unnested like the reference before staging. */
  def githubZipRefs: Seq[String] = {
    def readUrls(p: Path): Seq[String] =
      if (Files.exists(p)) Files.readAllLines(p).asScala.toSeq else Seq.empty
    val own = readUrls(jobFolder.resolve("glue_py_resources").resolve("github_zip_urls.txt"))
    val shared =
      if (includeSharedJobResources)
        readUrls(sharedFolder("glue_py_resources").resolve("github_zip_urls.txt"))
      else Seq.empty
    (own ++ shared).map(_.trim).filter(_.length > 10)
  }

  /** `_check_nondup_resources` (etl.py:332-340): staged files land in one
    * flat folder, so basenames must be unique across job + shared + github
    * resources. Message parity with the reference. */
  def checkNondupResources(paths: Seq[Path]): Unit = {
    val names = paths.map(_.getFileName.toString)
    if (names.distinct.length != names.length)
      throw new IllegalArgumentException(
        "There are duplicate file names in your supplied resources. A file " +
          "in job resources might share the same name as a file in the " +
          "shared resources folders.")
  }

  /** Staged layout analog of `s3_job_folder_no_bucket` (etl.py:166-168). */
  def stageJobFolder: Path =
    Paths.get(stageRoot, "_GraftJobs_", jobName, jobId, "resources")

  /** `s3_metadata_base_folder_no_bucket` (etl.py:174-176). */
  def stageMetadataFolder: Path = stageJobFolder.resolve("meta_data")

  /** `job_arguments` metadata injection analog (etl.py:186-190): every
    * packaged job can locate the staged agnostic metadata. */
  def jobArguments(user: Map[String, String] = Map.empty): Map[String, String] = {
    val special = Seq("--JOB_NAME", "--debug", "--mode", "--metadata_base_path",
      "--additional-python-modules")
    user.keys.foreach { k =>
      if (!k.startsWith("--") || special.contains(k))
        throw new IllegalArgumentException(
          s"Found incorrect job argument ($k). All arguments should begin " +
            s"with '--' and cannot be one of the following: ${special.mkString(", ")}")
    }
    user + ("--metadata_base_path" -> stageMetadataFolder.toString)
  }

  /** `_unnest_github_zipfile_and_return_new_zip_path` (utils.py:126-153):
    * github zipballs nest everything under `<repo>-<branch>/`; rewrite the
    * archive with that single top-level folder stripped, as `<name>_new.zip`
    * next to the original. */
  def unnestGithubZip(zipPath: Path): Path = {
    val out = zipPath.getParent.resolve(
      zipPath.getFileName.toString.replace(".zip", "_new.zip"))
    val zin = new java.util.zip.ZipInputStream(Files.newInputStream(zipPath))
    val zout = new java.util.zip.ZipOutputStream(Files.newOutputStream(out))
    try {
      var entry = zin.getNextEntry
      // the single top-level folder to strip, e.g. "gluejobutils-master/"
      var prefix: Option[String] = None
      while (entry != null) {
        val name = entry.getName
        if (prefix.isEmpty) prefix = Some(name.takeWhile(_ != '/') + "/")
        val stripped = name.stripPrefix(prefix.get)
        if (stripped.nonEmpty && !entry.isDirectory) {
          zout.putNextEntry(new java.util.zip.ZipEntry(stripped))
          zin.transferTo(zout)
          zout.closeEntry()
        }
        entry = zin.getNextEntry
      }
    } finally { zin.close(); zout.close() }
    out
  }

  /** `sync_job_to_s3_folder` (etl.py:481-526): resolve github zip refs
    * (local files here), unnest them, enforce unique basenames across
    * everything staged, wipe the previous staging for this job id, copy the
    * flat resource set + job.py, and mirror the `meta_data/` tree beneath
    * the staging folder. Returns the staged file paths. */
  def syncToStage(): Seq[Path] = {
    val githubResources = githubZipRefs.map(ref => unnestGithubZip(fetchZip(ref)))
    try {
      val filesToSync = githubResources ++ pyResources ++ resources ++ jars :+ jobPath
      checkNondupResources(filesToSync)

      // delete the tmp folder before uploading new data to it (etl.py:505)
      deleteStageFolder()
      Files.createDirectories(stageJobFolder)
      val staged = filesToSync.map { f =>
        Files.copy(f, stageJobFolder.resolve(f.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING)
      }

      // metadata tree: everything under <etl_root>/meta_data/**/*.json keeps
      // its path relative to meta_data/ (etl.py:446-455,514-519)
      val metaBase = etlRootFolder.resolve("meta_data")
      val metaStaged =
        if (!Files.isDirectory(metaBase)) Seq.empty
        else {
          val walk = Files.walk(metaBase)
          try walk.iterator().asScala
            .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".json"))
            .toSeq.sorted
            .map { p =>
              val rel = metaBase.relativize(p)
              val dest = stageMetadataFolder.resolve(rel)
              Files.createDirectories(dest.getParent)
              Files.copy(p, dest, StandardCopyOption.REPLACE_EXISTING)
            }
          finally walk.close()
        }
      staged ++ metaStaged
    } finally {
      // clean up the rezipped github files (etl.py:521-525)
      githubResources.foreach(Files.deleteIfExists(_))
    }
  }

  /** `delete_s3_job_temp_folder` (etl.py:737-743): remove this job id's
    * staging subtree; idempotent. */
  def deleteStageFolder(): Unit =
    rmTree(Paths.get(stageRoot, "_GraftJobs_", jobName, jobId))

  /** `cleanup` (etl.py:719-724): the "job" (its whole staged identity) and
    * the temp folder both go. */
  def cleanup(): Unit =
    rmTree(Paths.get(stageRoot, "_GraftJobs_", jobName))

  private def rmTree(root: Path): Unit = {
    if (!Files.exists(root)) return
    val walk = Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(Files.deleteIfExists(_))
    finally walk.close()
  }
}

object JobPackage {
  /** Default zip-ref resolver — the INJECTION POINT for the reference's
    * github download step (`etl.py:457-476` fetches the zipball over the
    * network before unnesting). This engine runs in zero-egress
    * environments, so the default accepts only refs that already resolve
    * locally (`file:`-prefixed or plain paths); a deployment with egress
    * supplies its own `fetchZip` (download to a temp file, return the
    * path) and gets the reference's full flow, unnesting included. */
  val localFetch: String => Path = { ref =>
    val p = Paths.get(ref.stripPrefix("file://").stripPrefix("file:"))
    if (!Files.exists(p)) throw new IllegalArgumentException(
      s"github zip ref $ref must resolve to a local zip file " +
        "(no network egress at package time)")
    p
  }
}
