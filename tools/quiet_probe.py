"""15-second host-quietness probe — gate for re-running the scaling pairs.

The strong/tri scaling measurements are only meaningful in a quiet tenancy
window (BENCH.md: identical runs drift ±40%; the 32-wide run alone pays for
noisy neighbors). This probe runs the allocation-heavy ``text``-class burn
(the pipeline's workload class, see tools/host_calibration.py) at 8 and 32
processes with SMALL fixed work and prints eff = t_8 / t_32. Read:

* eff >= 0.55 and t_8 near its best-seen -> quiet window, fire the pair;
* eff <  0.45 -> contended, don't bother.

Usage: python tools/quiet_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import re
import time
from multiprocessing import Process

WORDS = ("the fast key order sort table scan merge part window small hash "
         "scan join order batch stream spark dup filter group query row").split()


def _burn_text(n: int) -> None:
    rx = re.compile(r"[a-z]+")
    corpus = [" ".join(WORDS[i % 12 : i % 12 + 8]) for i in range(2000)]
    for _ in range(n):
        for s in corpus:
            toks = rx.findall(s.lower())
            "_".join(toks).split("_")


def timed(p: int, n: int) -> float:
    procs = [Process(target=_burn_text, args=(n,)) for _ in range(p)]
    t0 = time.time()
    for pr in procs:
        pr.start()
    for pr in procs:
        pr.join()
    return time.time() - t0


if __name__ == "__main__":
    _burn_text(5)  # warm the interpreter
    t8 = timed(8, 1500)
    t32 = timed(32, 1500)
    print(json.dumps({"t8": round(t8, 2), "t32": round(t32, 2),
                      "eff_8_32": round(t8 / t32, 3)}))
