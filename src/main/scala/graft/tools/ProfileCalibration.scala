package graft.tools

/** Measure the three calibration kernels ([[graft.Bench]]) — the tool
  * that sets/refreshes the committed quiet-host references and, run
  * beside a divergent bench artifact, attributes its inflation:
  * single-thread ratio up → host slower; parallel ratio up while
  * single-thread quiet → multi-core contention (the r18 driver-run
  * signature); mem ratio up alone → bandwidth co-tenancy. */
object ProfileCalibration {
  def main(args: Array[String]): Unit = {
    val samples = if (args.nonEmpty) args(0).toInt else 5
    val cpu = (1 to samples).map { _ =>
      val (s, _) = graft.Bench.calibrationRun(); println(f"cpu    $s%.3f s"); s
    }
    val par = (1 to samples).map { _ =>
      val (s, _) = graft.Bench.calibrationParRun(); println(f"par    $s%.3f s"); s
    }
    val mem = (1 to samples).map { _ =>
      val (s, _) = graft.Bench.calibrationMemRun(); println(f"mem    $s%.3f s"); s
    }
    println(f"min: cpu ${cpu.min}%.3f (ref ${graft.Bench.ReferenceCalibrationSec}%.3f), " +
      f"par ${par.min}%.3f (ref ${graft.Bench.ReferenceCalibrationParSec}%.3f), " +
      f"mem ${mem.min}%.3f (ref ${graft.Bench.ReferenceCalibrationMemSec}%.3f)")
    println(f"loadavg ${graft.Bench.loadAvg1()}%.2f, cores ${Runtime.getRuntime.availableProcessors}")
  }
}
