"""Host parallel-efficiency ceiling — the calibration artifact for BENCH.md.

The two-cluster-size rule (BASELINE.json: throughput scaling efficiency
>= 0.8 from N to 4N executors) is evidenced in this sandbox by running the
same job at N and 4N cores of ONE shared VM. That substitution has a
measurable confound: this host does not scale even *pure, cache-resident
CPU work* perfectly across processes (shared/oversubscribed vCPUs + SMT) —
so the honest reading of a pipeline efficiency number requires the host's
own ceiling at the same process counts, measured by something that has no
Spark, no JVM, no shuffles, and no memory traffic to speak of.

Three probes, all embarrassingly parallel with zero coordination:

* ``cpu``  — chained md5 over a 64-byte buffer (cache-resident ALU work);
* ``scan`` — repeated full scans of a 200 MB bytearray (memory bandwidth);
* ``text`` — regex match + lower/split/join over a ~40 MB corpus of short
  sentences (allocation-heavy string work — the KG pipeline's workload
  class; its per-core working set and allocation rate hit the shared cache
  and memory subsystem harder than either of the other probes).

Efficiency definition matches tools/scaling_bench.py: each process does a
FIXED amount of work, so throughput(p) = p*work/t_p and
eff(N->4N) = thr(4N) / (4*thr(N)) = t_N / t_4N.

Usage: python tools/host_calibration.py [N] [mult]   (default 2 4)
Prints ONE JSON line; exit code 0.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from multiprocessing import Process


def _burn_cpu(n: int) -> None:
    h = b"x" * 64
    for _ in range(n):
        h = hashlib.md5(h).digest()


def _burn_scan(n: int) -> None:
    a = bytearray(200_000_000)
    s = 0
    for _ in range(n):
        s += a.count(1)


def _burn_text(n: int) -> None:
    import re

    words = "reactor vessel stirrer sample aliquot measurement device unit value".split()
    sentences = [
        f"The {words[i % 9]}-{i} has part {words[(i + 3) % 9]} and measured value {i}.5 units"
        for i in range(400_000)
    ]  # ~40 MB working set per process
    rx = re.compile(r"([A-Za-z][a-z]+)-(\d+) has part ([a-z]+).*value (\d+)\.(\d)")
    acc = 0
    for _ in range(n):
        for s in sentences:
            m = rx.search(s)
            if m:
                acc += len("|".join(s.lower().replace("-", " ").split()))
    assert acc >= 0


def _measure(target, nproc: int, work: int, repeats: int = 3) -> float:
    """Best-of-N wall time for nproc processes each doing `work` units."""
    best = float("inf")
    for _ in range(repeats):
        ps = [Process(target=target, args=(work,)) for _ in range(nproc)]
        t0 = time.perf_counter()
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        best = min(best, time.perf_counter() - t0)
    return best


def calibrate(n: int, mult: int) -> dict:
    cpu_n = _measure(_burn_cpu, n, 3_000_000)
    cpu_4n = _measure(_burn_cpu, n * mult, 3_000_000)
    scan_n = _measure(_burn_scan, n, 10)
    scan_4n = _measure(_burn_scan, n * mult, 10)
    text_n = _measure(_burn_text, n, 3)
    text_4n = _measure(_burn_text, n * mult, 3)
    return {
        "levels": [n, n * mult],
        "cpu_seconds": [round(cpu_n, 3), round(cpu_4n, 3)],
        "scan_seconds": [round(scan_n, 3), round(scan_4n, 3)],
        "text_seconds": [round(text_n, 3), round(text_4n, 3)],
        "cpu_eff": round(cpu_n / cpu_4n, 3),
        "scan_eff": round(scan_n / scan_4n, 3),
        "text_eff": round(text_n / text_4n, 3),
        # the ceiling any real workload can reach on this host at these
        # process counts; 'text' is the pipeline's workload class (string/
        # regex + allocation), cpu/scan bound it from above
        "host_ceiling": round(cpu_n / cpu_4n, 3),
        "host_ceiling_text": round(text_n / text_4n, 3),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print(json.dumps(calibrate(n, mult)))


if __name__ == "__main__":
    main()
