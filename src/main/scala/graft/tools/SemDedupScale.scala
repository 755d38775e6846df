package graft.tools

import graft.similarity.Knn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Flat-vs-tree coarse assignment measurement (SURVEY §2 E44t): at
  * K = k1·k2 total cells, flat argmin costs n·K distance rows while the
  * two-level tree resolves each vector in n·(k1+k2). Both paths assign
  * against the SAME K centroids (the tree's level-2 composite set, so
  * the comparison isolates assignment cost, not centroid quality);
  * agreement_bp reports how often the tree's greedy level-1 descent
  * lands on the flat argmin — the recall/cost trade of hierarchical
  * quantizers. Also times the END-TO-END dedup term
  * (semanticDedupAssigned over each assignment) at the same scaled K —
  * the flat-vs-tree gap on the dedup itself, not just the assignment.
  * One JSON line per run; point it at sf0.1 / target/sf1 / target/sf10
  * for the decade evidence.
  *
  * `probes` adds the MULTI-PROBE descent legs (r11 verdict item 2): the
  * greedy probe=1 tree is measured AND the top-p descent for EVERY p in
  * the comma-separated list, each with its agreement against the flat
  * argmin — the evidence that multi-probe recovers the agreement greedy
  * loses as K grows, and the p-vs-agreement curve that sizes the dial
  * (agreement is provably monotone in p; flat is computed ONCE and
  * reused as the truth for every leg, which matters at sf10 where the
  * flat pass alone is ~37 min).
  *
  * Usage: runMain graft.tools.SemDedupScale [sfDir] [k1] [k2] [iters] [probes]
  *        (probes e.g. "2,3,4,6" — default "3")
  */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val k1 = args.lift(1).map(_.toInt).getOrElse(8)
    val k2 = args.lift(2).map(_.toInt).getOrElse(8)
    val iters = args.lift(3).map(_.toInt).getOrElse(2)
    val probesRaw = args.lift(4).getOrElse("3").split(",").map(_.trim.toInt).toSeq
    val probes = probesRaw.filter(p => p > 1 && p <= k1).distinct.sorted
    probesRaw.filterNot(p => p > 1 && p <= k1).foreach { p =>
      System.err.println(s"! probe $p dropped (must satisfy 1 < p <= k1=$k1)")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = e.count()
    val (l1, l2) = Knn.ivfTrain2(e, "vec_id", "embedding", k1, k2, iters, 64)
    // the same K centroids as a FLAT set: composite id = cell·k2 + child
    val flatCents = l2.select(
      (col("cell") * k2.toLong + col("group")).as("group") +:
        col("n") +: (0 until 64).map(i => col(s"s_$i")): _*)
      .localCheckpoint()
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (flat, flatS) = timed {
      Knn.ivfAssign(e, flatCents, "vec_id", "embedding", 64).localCheckpoint()
    }
    val (tree, treeS) = timed {
      Knn.treeAssign(e, l1, l2, "vec_id", "embedding", k2, 64).localCheckpoint()
    }
    def agreement(t: org.apache.spark.sql.DataFrame): Long =
      flat.withColumnRenamed("cluster", "__f")
        .join(t, "vec_id")
        .agg(sum(when(col("__f") === col("cluster"), 1L).otherwise(0L))).head().getLong(0)
    val agree = agreement(tree)
    // one leg per probe against the SAME flat truth; the last probe's
    // assignment also feeds the end-to-end dedup term below
    val probeLegs = probes.map { p =>
      val (tp, tpS) = timed {
        Knn.treeAssign(e, l1, l2, "vec_id", "embedding", k2, 64, p)
          .localCheckpoint()
      }
      (p, tp, tpS, agreement(tp))
    }
    val lastProbe = probeLegs.lastOption
    // END-TO-END dedup term over each assignment: the within-cell pair
    // join rides Σ cell², so K (scaled with the corpus: cells ≈ n/c for
    // a target cell size c) is what keeps SemDeDup sub-quadratic. The
    // oracle-gate fixtures pin K to a handful of label centroids for a
    // small DuckDB oracle — DEGENERATE above sf1 (cell size grows
    // linearly with the corpus → pair mass quadratically; observed:
    // dedup_semantic at sf10 ran 50+ min on the pair join alone). This
    // is the scaled-K measurement of the same composition.
    val tau = 9500L
    val (nFlat, flatDedupS) = timed {
      Knn.semanticDedupAssigned(
        e.join(flat, "vec_id"), "vec_id", "embedding", "cluster", tau).count()
    }
    val (nTree, treeDedupS) = timed {
      Knn.semanticDedupAssigned(
        e.join(tree, "vec_id"), "vec_id", "embedding", "cluster", tau).count()
    }
    // None when no probe legs ran — the JSON then emits null for the
    // tree_probe fields instead of aliasing the greedy leg's numbers,
    // which would read as a real probe measurement (r12 advice).
    val probeDedup: Option[(Long, Double)] = lastProbe.map {
      case (_, tp, _, _) => timed {
        Knn.semanticDedupAssigned(
          e.join(tp, "vec_id"), "vec_id", "embedding", "cluster", tau).count()
      }
    }
    val probeJson = probeLegs.map { case (p, _, s, a) =>
      s""""$p":{"rows":${n * (k1 + p.toLong * k2)},"s":$s,""" +
        s""""agreement_bp":${if (n == 0) 0 else a * 10000 / n}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"semdedup_scale","sf":"$sfDir","n":$n,"k1":$k1,"k2":$k2,""" +
      s""""flat_rows":${n * k1 * k2},"tree_rows":${n * (k1 + k2)},""" +
      s""""flat_s":$flatS,"tree_s":$treeS,""" +
      s""""flat_dedup_s":$flatDedupS,"tree_dedup_s":$treeDedupS,""" +
      s""""tree_probe_dedup_s":${probeDedup.map(_._2).map(_.toString).getOrElse("null")},""" +
      s""""survivors_flat":$nFlat,"survivors_tree":$nTree,""" +
      s""""survivors_tree_probe":${probeDedup.map(_._1).map(_.toString).getOrElse("null")},""" +
      s""""agreement_bp":${if (n == 0) 0 else agree * 10000 / n},""" +
      s""""probe_legs":$probeJson}""")
    spark.stop()
  }
}
