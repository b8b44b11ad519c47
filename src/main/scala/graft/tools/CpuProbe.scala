package graft.tools

/** Standalone CPU-probe runner (round-12 verdict item: the 0.53 → 0.62
  * reference recalibration was adjudicated in prose — the measurement
  * itself must be a committed artifact, and future recalibrations need
  * a template). Runs the EXACT probe kernel Bench gates on
  * ([[graft.Bench.cpuProbeSec]], min-of-3 of a fixed 400M-round integer
  * mixing loop) in this one JVM and prints a single JSON line.
  *
  * Recalibration protocol (PROBE_CALIBRATION.json + BENCHLOG.md):
  * quiet the box (zero other JVMs, 1-min load < 1), run
  *
  *   for i in 1 2 3 4; do scripts/probe.sh; done
  *
  * — four STANDALONE sequential JVMs, so no shared-JVM JIT state or
  * heap can flatter a sample — and only move the committed reference
  * when all four agree within a few percent AND full-suite totals at
  * the same window sit at historical bests (probe drift WITHOUT suite
  * drift = single-core turbo epoch, the thing a recalibration is for;
  * probe drift WITH suite drift = the machine got slow — fix the box,
  * not the reference). */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    // SAME kernel and SAME environment sensors as the guard being
    // calibrated (round-13 review: a parallel reimplementation could
    // disagree with the guard on the very box state it certifies)
    val probe = graft.Bench.cpuProbeSec()
    val probePar = graft.Bench.cpuProbeParSec()
    val jvms = graft.Bench.otherJvms()
    val load = graft.Bench.loadAvg1m()
    println(f"""{"probe_sec":$probe%.4f,"probe_par_sec":$probePar%.4f,""" +
      f""""load_1m":$load%.2f,"other_jvms":$jvms}""")
  }
}
