package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Lifecycle of the TWO-LEVEL persisted IVF layout — the geometry a
  * re-split flips to when the wanted cell count passes the flat
  * partition-dir ceiling (`maxFlatCells`, shrunk here to force the
  * path at spec scale). Covers: the layout and sidecar shape, exact
  * probe-all equality with brute force, recall at bounded probes,
  * append + minor fold + non-resplit major over the two-level index,
  * and base-leg partition pruning on the probed coarse groups. */
class IvfTwoLevelSpec extends SparkSpec {
  import spark.implicits._

  private def mkVecs(n: Int) = (0 until n).map(i =>
    (i.toLong, Array.tabulate(16)(j => math.sin(i * 7 + j * 13).toFloat)))
    .toDF("vec_id", "embedding")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet

  test("re-split past the flat ceiling flips to the two-level layout; " +
    "probe-all equals brute force; lifecycle verbs keep working") {
    val uri = TestSession.tmpDir("ivf2l")
    val vecs = mkVecs(3000).cache()
    val queries = vecs.filter($"vec_id" < 5)
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", uri, nCentroids = 8)
    // want ceil(3000/20) = 150 cells > maxFlatCells=32: two-level flip
    Similarity.compactIvfIndex(spark, uri, resplitTargetRows = 20,
      maxFlatCells = 32)
    val fs = graft.storage.VFS(spark)
    val gen = Similarity.cellsPath(spark, uri)
    val dirs = fs.ls(gen).map(p => p.substring(p.lastIndexOf('/') + 1))
    assert(dirs.exists(_.startsWith("group_id=")),
      s"two-level layout missing group dirs: $dirs")
    assert(!dirs.exists(_.startsWith("centroid_id=")),
      "two-level layout must not keep per-fine-cell dirs")
    val sidecar = fs.readString(s"$gen/_centroids.json")
    assert(sidecar.contains("\"coarse\"") && sidecar.contains("\"members\""),
      "geometry sidecar lacks the two-level tables")
    val cents = Similarity.indexCentroids(spark, uri)
    assert(cents.size > 32, s"re-split stopped at the flat cap: ${cents.size}")
    // the group dir count stays bounded by ~sqrt(k), not k
    assert(dirs.count(_.startsWith("group_id=")) < cents.size,
      "group dirs should be far fewer than fine cells")

    // probe-ALL (every group, every fine cell) == exact brute force
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
    val all = Similarity.ivfIndexTopK(spark, uri, queries, "vec_id",
      "embedding", k = 10, nprobe = cents.size, nprobeCoarse = cents.size)
    assert(rows(all) == rows(brute), "probe-all diverged from brute force")

    // bounded probes: recall@10 of the approximate path
    val approx = Similarity.ivfIndexTopK(spark, uri, queries, "vec_id",
      "embedding", k = 10, nprobe = 8, nprobeCoarse = 4)
    val bruteIds = brute.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val approxIds = approx.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (bruteIds & approxIds).size.toDouble / bruteIds.size
    assert(recall >= 0.6, f"two-level recall@10 too low: $recall%.2f")

    // append lands in the flat inc tier and is immediately probeable
    val extra = Seq((9000L,
      Array.tabulate(16)(j => math.sin(3 * 7 + j * 13).toFloat)))
      .toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(extra, "vec_id", "embedding", uri)
    val q3 = vecs.filter($"vec_id" === 3L)
    def hitIds(np: Int = 8) = Similarity.ivfIndexTopK(spark, uri, q3,
        "vec_id", "embedding", k = 4, nprobe = np, nprobeCoarse = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(hitIds().contains(9000L), s"appended vec not probed: ${hitIds()}")

    // minor fold (inc-only) and a NON-resplit major both preserve the
    // two-level layout and the results
    Similarity.minorCompactIvfIndex(spark, uri)
    assert(hitIds().contains(9000L), "lost after minor fold")
    Similarity.compactIvfIndex(spark, uri)
    val gen2 = Similarity.cellsPath(spark, uri)
    assert(gen2 != gen, "major must flip the generation")
    val dirs2 = fs.ls(gen2).map(p => p.substring(p.lastIndexOf('/') + 1))
    assert(dirs2.exists(_.startsWith("group_id=")),
      s"major dropped the two-level layout: $dirs2")
    assert(hitIds().contains(9000L), "lost after major fold")
    val all2 = Similarity.ivfIndexTopK(spark, uri, queries, "vec_id",
      "embedding", k = 10, nprobe = cents.size, nprobeCoarse = cents.size)
    val brute2 = Similarity.bruteForceTopK(vecs.unionByName(extra), "vec_id",
      "embedding", queries, "vec_id", "embedding", k = 10)
    assert(rows(all2) == rows(brute2),
      "probe-all after append+folds diverged from brute force")
    vecs.unpersist()
  }

  test("two-level probe prunes the base scan to the probed group dirs") {
    val uri = TestSession.tmpDir("ivf2l-plan")
    val vecs = mkVecs(2000)
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding", uri, nCentroids = 8)
    Similarity.compactIvfIndex(spark, uri, resplitTargetRows = 20,
      maxFlatCells = 16)
    val q = vecs.filter($"vec_id" === 7L)
    val df = Similarity.ivfIndexTopK(spark, uri, q, "vec_id", "embedding",
      k = 5, nprobe = 4, nprobeCoarse = 2)
    val plan = org.apache.spark.sql.graftshim.Shim.plannedPhysical(df)
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("ivf2l-plan")) => s
    }
    assert(scans.nonEmpty, s"no cells scan in plan:\n$plan")
    val pruned = scans.exists(_.metadata.getOrElse("PartitionFilters", "")
      .contains("group_id"))
    assert(pruned, "probed-group partition pruning missing:\n" +
      scans.map(_.metadata.getOrElse("PartitionFilters", "")).mkString("\n"))
  }
}
