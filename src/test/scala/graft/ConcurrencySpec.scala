package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.{Callable, Executors, TimeUnit}

/** Concurrency smoke for the session-shared machinery: N inventory
  * queries race on ONE SparkSession across 8 threads — every query
  * twice, so the shared-stage caches (sharedShingles / sharedSpans /
  * embed pairs, Queries' double-build-one-winner path) and the ANN
  * index builds (annIndexPath) are hit by genuine same-key races — and
  * every result must equal the serial run. A corpus dir no other spec
  * uses guarantees the caches start COLD, so the race is on first
  * build, not a warm read. Catches session-global temp-view leakage,
  * cache put/unpersist races, and non-thread-safe plan construction
  * that a serial bench can never see. */
class ConcurrencySpec extends SparkTestBase {

  /** Fresh copy of the sf0.001 fixtures so this spec owns its cache key. */
  private def copiedFixtureDir(): String = {
    val dir = Files.createTempDirectory("graft-conc")
    graft.sources.Tables.all.foreach { t =>
      val src = Paths.get(s"${sf()}/$t.parquet")
      if (Files.isRegularFile(src))
        Files.copy(src, dir.resolve(s"$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
      else {
        // directory-parquet (GenData layout): copy the tree
        val dst = dir.resolve(s"$t.parquet")
        Files.walk(src).forEach { p: Path =>
          val rel = dst.resolve(src.relativize(p).toString)
          if (Files.isDirectory(p)) Files.createDirectories(rel)
          else Files.copy(p, rel, StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
    dir.toString
  }

  test("concurrent queries on one session equal the serial run (cold shared stages)") {
    // every shared-stage family + both index builds + plain controls
    val names = Seq(
      "q_dedup_ngram", "q_dedup_clusters", "q_dedup_minhash",   // shared shingles
      "q_dedup_keep_best",                                      // shared cluster labels (2 consumers)
      "q_dedup_spans", "q_dedup_spans_strip",                   // shared spans
      "q_dedup_embed", "q_dedup_semantic",                      // shared embed pairs
      "q_sim_ivf_indexed", "q_sim_lsh_indexed",                 // annIndexPath builds
      "q_sim_pq_indexed",                                       // pq code-table build
      "q_decontaminate_bloom", "q_sample_cap_source",           // broadcast + TopKAgg
      "q_text_perplexity",                                      // operator-internal bigram persist (r6)
      "q_graph_pagerank",                                       // iterative persist-swap ranks (r6)
      "q_tpch1", "q_agg_group", "q_text_tfidf")                 // plain controls
    val dir = copiedFixtureDir()
    val pool = Executors.newFixedThreadPool(8)
    try {
      // two submissions per query, interleaved across the pool: first
      // touches race the cold cache build, seconds race warm reads
      val futures = (names ++ names.reverse).map { n =>
        n -> pool.submit(new Callable[Seq[String]] {
          override def call(): Seq[String] =
            SparkEntry.queries(n)(spark, dir).collect()
              .map(_.toString).sorted.toSeq
        })
      }
      val concurrent = futures.map { case (n, f) => n -> f.get(600, TimeUnit.SECONDS) }
      val serial = names.map { n =>
        n -> SparkEntry.queries(n)(spark, dir).collect().map(_.toString).sorted.toSeq
      }.toMap
      concurrent.foreach { case (n, rows) =>
        assert(rows == serial(n), s"concurrent result of $n diverged from serial")
        assert(rows.nonEmpty, s"$n returned no rows")
      }
    } finally pool.shutdownNow()
  }
}
