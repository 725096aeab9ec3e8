package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the run-derived scaling-cleanliness criteria ([[ScalingGate]]).
  *
  * Context (see Bench.scala's Pair scaladoc): this Firecracker guest
  * gets no hypervisor steal accounting, so wall-clock probes cannot see
  * host-level CPU deprivation — the gate instead derives cleanliness
  * from each run's own published wall/core-second numbers. The
  * calibration points asserted here are measured values from
  * 2026-08-17: quiet 16c pipeline floor ≈ 19.7 s wall / ~300 core-s
  * (util 0.95), deprived run 31.8 s / 318 core-s (util 0.62),
  * DRAM-contended runs 345-404 core-s.
  */
class BenchGateSpec extends AnyFunSuite {
  private val MinUtil = 0.85
  private val CpuTol = 1.15

  private def clean(probeClean: Boolean = true, wall: Double, cpu: Double,
      cores: Int = 16, floor: Double = 300.0): Boolean =
    ScalingGate.runClean(probeClean, wall, cpu, cores, floor, MinUtil, CpuTol)

  test("quiet-floor run passes: util 0.95, cpu at the session floor") {
    assert(clean(wall = 19.7, cpu = 300.0))
  }

  test("host-deprived run fails on utilization even with floor core-seconds") {
    // the measured 31.8 s / 318 core-s run: work at the floor, but
    // spread over 62% effective cores — wall ratio would be garbage
    assert(!clean(wall = 31.8, cpu = 318.0))
  }

  test("DRAM-contended run fails on core-second inflation despite high util") {
    // 16 busy cores burning 1.3x the core-seconds for the same work
    assert(!clean(wall = 25.0, cpu = 390.0))
  }

  test("probe-dirty run never passes, whatever its accounting says") {
    assert(!clean(probeClean = false, wall = 19.7, cpu = 300.0))
  }

  test("missing CPU accounting (in-process mode) defers to the probe verdict") {
    assert(clean(wall = 50.0, cpu = -1.0))
    assert(!clean(probeClean = false, wall = 50.0, cpu = -1.0))
  }

  test("missing session floor (first fork pair) defers to the probe verdict") {
    assert(clean(wall = 19.7, cpu = 300.0, floor = -1.0))
  }

  test("boundaries: exactly minUtil and exactly tol x floor are clean") {
    // util exactly 0.85: cpu = 0.85 * wall * cores
    assert(clean(wall = 20.0, cpu = 0.85 * 20.0 * 16, floor = 0.85 * 20.0 * 16))
    // cpu exactly 1.15x floor with high util
    assert(clean(wall = 20.0, cpu = 345.0, floor = 300.0))
    assert(!clean(wall = 20.0, cpu = 345.1, floor = 300.0))
  }

  test("4-core level calibration: measured clean runs pass") {
    // 4c runs measured util 0.97, cpu 256-270 core-s, wall 66-69 s
    assert(clean(wall = 67.6, cpu = 263.0, cores = 4, floor = 256.4))
    // and a 4c run with the same wall but only half the CPU would fail
    assert(!clean(wall = 67.6, cpu = 135.0, cores = 4, floor = 130.0))
  }
}
