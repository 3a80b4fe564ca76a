package graft.harness

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gen.PanelGenerator

/** Per-cell checkpoint-and-resume for the simulation grid (reference:
  * simulation.R:251-275 — each cell's results are written to disk as soon
  * as they complete and reloaded on a rerun, so a partially-finished grid
  * never recomputes finished cells).
  *
  * Each cell's per-replication results are written to
  * `checkpointDir/cell_<nInternal>_<nExternal>` as parquet; a rerun (or a
  * grid extended with new cells) loads finished cells from disk and only
  * computes the missing ones. Seeds are keyed by the CELL, not its
  * position in the grid list, so resuming with a reordered or extended
  * grid reproduces identical draws per cell.
  */
object GridRunner {

  import SimulationRunner.Cell

  final case class CellStatus(cell: Cell, loadedFromCheckpoint: Boolean)

  /** Deterministic per-cell seed base — a function of the cell only. */
  def cellSeed(baseSeed: Long, cell: Cell): Long =
    baseSeed + cell.nInternal.toLong * 1000003L + cell.nExternal.toLong * 733L

  /** Run (or resume) the grid; returns the unioned per-rep results plus
    * which cells were computed vs loaded.
    */
  def runGrid(spark: SparkSession, cells: Seq[Cell], nReps: Int,
              methods: Seq[String], checkpointDir: Option[String],
              cfg0: PanelGenerator.Config = PanelGenerator.Config(),
              baseSeed: Long = 2024L,
              truth: Array[Double] = SimulationRunner.betaRTrue): (DataFrame, Seq[CellStatus]) = {
    // a checkpoint is only valid for the run configuration that wrote it —
    // resuming with different reps/methods/DGP/seed/truth must recompute,
    // not silently serve stale data. Truth affects the stored `covered`
    // column, so it is part of the key (sensitivity scenarios override it).
    def metaString(cell: Cell): String = {
      val truthTag =
        if (truth.sameElements(SimulationRunner.betaRTrue)) ""
        else s"|truth=${truth.mkString(",")}"
      s"v1|nReps=$nReps|methods=${methods.mkString(",")}|cfg=$cfg0|seed=${cellSeed(baseSeed, cell)}$truthTag"
    }

    val runs = cells.map { cell =>
      def compute(): DataFrame = SimulationRunner.perRepResults(
        spark, Seq(cell), nReps, methods, cfg0, cellSeed(baseSeed, cell),
        truth = truth)
      checkpointDir match {
        case None => (compute(), CellStatus(cell, loadedFromCheckpoint = false))
        case Some(dir) =>
          val path = s"$dir/cell_${cell.nInternal}_${cell.nExternal}"
          val hPath = new Path(path)
          val metaPath = new Path(hPath, "_graft_meta")
          val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val metaMatches = fs.exists(new Path(hPath, "_SUCCESS")) &&
            fs.exists(metaPath) && {
              val in = fs.open(metaPath)
              try new String(in.readAllBytes(), "UTF-8") == metaString(cell)
              finally in.close()
            }
          if (metaMatches)
            (spark.read.parquet(path), CellStatus(cell, loadedFromCheckpoint = true))
          else {
            // refuse to clobber a HIGHER-rep checkpoint with a lower-rep
            // run (e.g. a quick pass with GRAFT_GRID_SCALE_REPS=10 over
            // the committed 400-rep cells) — that silently breaks every
            // pin that re-asserts from the checkpoint. Override with
            // GRAFT_GRID_FORCE=1 or point the run at a fresh directory.
            if (fs.exists(metaPath)) {
              val in = fs.open(metaPath)
              val existing = try new String(in.readAllBytes(), "UTF-8") finally in.close()
              val repsRe = """nReps=(\d+)""".r
              (repsRe.findFirstMatchIn(existing), nReps) match {
                case (Some(m), newReps) if m.group(1).toInt > newReps &&
                    !sys.env.get("GRAFT_GRID_FORCE").contains("1") =>
                  throw new IllegalStateException(
                    s"checkpoint $path holds ${m.group(1)} reps; refusing to " +
                    s"overwrite with a $newReps-rep run. Use a separate " +
                    "checkpoint dir for quick passes, or set GRAFT_GRID_FORCE=1.")
                case _ => ()
              }
            }
            // repartition(1) — NOT coalesce(1), which would lazily collapse
            // the whole battery stage onto one task; the shuffle here moves
            // only the ≤ nReps×methods×2 tiny result rows into one file
            compute().repartition(1).write.mode("overwrite").parquet(path)
            val out = fs.create(metaPath, true)
            try out.write(metaString(cell).getBytes("UTF-8")) finally out.close()
            (spark.read.parquet(path), CellStatus(cell, loadedFromCheckpoint = false))
          }
      }
    }
    (runs.map(_._1).reduce(_ unionByName _), runs.map(_._2))
  }
}
