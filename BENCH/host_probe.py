#!/usr/bin/env python
"""10-second host-health probe gating any timing promoted to KERNELS.md /
BASELINE.md (PLANS.md round-close host-window record).

Separates the two host failure modes seen this series:
  - co-tenant CPU steal      -> cpu3M rises above ~0.3 s
  - hypervisor fault-path    -> alloc192MB rises above ~0.12 s while cpu3M
    degradation (fresh-page      stays normal (in-VM metrics show nothing:
    servicing ~50x slow)         memory free, PSI zero)

Healthy reference on this host: alloc192MB ~0.05-0.10 s, cpu3M ~0.10-0.17 s.
Fresh-JVM Spark kernels fault their whole heap + tmpfs shuffle dirs every
run, so the alloc probe is the one that predicts their wall time.
"""
import time

ALLOC_HEALTHY_S = 0.12
CPU_HEALTHY_S = 0.3


def probe() -> dict:
    """One sample: ~192 MB of fresh allocations + a 3M-iteration loop.

    The single importable implementation — bench.py and the kernel
    harnesses call THIS so the thresholds cannot silently diverge.
    """
    import numpy as np

    a = np.random.RandomState(0).rand(8_000_000)  # warm (faulted) pages
    t0 = time.time()
    b = a + a
    c = b * a
    _ = c + b  # ~192 MB of fresh allocations
    alloc_s = time.time() - t0
    t0 = time.time()
    _ = sum(i for i in range(3_000_000))
    cpu_s = time.time() - t0
    return {
        "alloc192MB_s": round(alloc_s, 3),
        "cpu3M_s": round(cpu_s, 3),
        "healthy": alloc_s < ALLOC_HEALTHY_S and cpu_s < CPU_HEALTHY_S,
    }


def probe_min(k: int) -> dict:
    """Min-of-k back-to-back samples, k >= 1 (k=1 == probe()).

    Round-5-final finding: in that session's host phase the FIRST alloc
    probe from an idle process read 0.6-1.8 s while immediate repeats
    read 0.05-0.07 s (measured 10-probe sequence in KERNELS.md) — a
    COLD-start fault-path artifact, not steady-state capacity: sustained
    Spark workloads in the same phase ran the series' best bench
    (1581 units/s) and kernel harness brackets flipped healthy mid-run
    under load. A single cold probe therefore OVER-reports degradation
    for warm workloads; min-of-k measures the warm fault path a running
    JVM actually sees. k is caller-chosen via SPARK_GRAFT_PROBE_MIN_K in
    gate_or_abort (default 1 — the conservative historical gate), and
    every sample is recorded so the cold reading stays visible."""
    samples = [probe() for _ in range(max(k, 1))]
    best = min(samples, key=lambda p: p["alloc192MB_s"])
    return {
        "alloc192MB_s": best["alloc192MB_s"],
        "cpu3M_s": min(p["cpu3M_s"] for p in samples),
        "healthy": best["healthy"],
        "samples": [p["alloc192MB_s"] for p in samples],
    }


def gate_or_abort(probes: list, attempts: dict) -> None:
    """Probe-bracket gate shared by the kernel harnesses (the single
    implementation, so the degradation policy cannot silently diverge):
    probe BEFORE every timed child and after the last, append the sample
    to ``probes``, and abort the harness in a degraded window — the
    degradation swings within minutes (knn control run: 0.15 -> 8.3 s),
    so a timed region is only probe-clean if bracketed on both sides;
    the next child's leading probe is the previous child's trailing one.
    Completed attempts are printed before the abort (minutes of child
    runs are data even when the window closes mid-harness).
    SPARK_GRAFT_ALLOW_DEGRADED=1 records anyway."""
    import json
    import os

    k = int(os.environ.get("SPARK_GRAFT_PROBE_MIN_K", "1"))
    p = probe_min(k) if k > 1 else probe()
    probes.append(p)
    if not p["healthy"] and not os.environ.get("SPARK_GRAFT_ALLOW_DEGRADED"):
        print(json.dumps({
            "aborted": "host degraded", "probes": probes,
            "attempts": {str(k): v for k, v in attempts.items()},
        }))
        raise SystemExit(
            f"host fault-path degraded (alloc probe {p['alloc192MB_s']}s): "
            "numbers from this window are not promotable; set "
            "SPARK_GRAFT_ALLOW_DEGRADED=1 to record anyway"
        )


if __name__ == "__main__":
    p = probe()
    print(
        f"alloc192MB={p['alloc192MB_s']:.3f}s cpu3M={p['cpu3M_s']:.3f}s "
        f"{'HEALTHY' if p['healthy'] else 'DEGRADED'}"
    )
