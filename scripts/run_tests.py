"""De-flaked test runner: every test module in its own pytest subprocess.

Why (VERDICT r4 weak #4): XLA:CPU segfaults NATIVELY when a long-lived
process compiles late in life with hundreds of live executables
accumulated — the in-process suite only passes with a pile of workarounds
(solver-first ordering, module-boundary jax.clear_caches(), compile cache
off). Process-per-module removes the shared-process state entirely:

- ORDER-INDEPENDENT: modules run in any order (use --shuffle to prove it);
  each subprocess starts with zero live executables.
- FAULT-ISOLATED: a native crash fails one module, not the whole run.
- PARALLEL: -j N runs N module-processes concurrently (default: min(2,
  cpus) — XLA:CPU compiles are multithreaded already, more workers thrash).

Usage:
  python scripts/run_tests.py            # all modules, 2 workers
  python scripts/run_tests.py --shuffle  # random module order (seeded)
  python scripts/run_tests.py -j 1 tests/test_solver.py tests/test_imu.py

`python -m pytest tests/ -x -q` (the single-process invocation) remains
supported via the conftest workarounds; this runner is the robust path.
"""

import argparse
import glob
import os
import random
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_module(path: str, extra: list) -> dict:
    t0 = time.perf_counter()
    p = subprocess.run(
        [sys.executable, "-m", "pytest", path, "-q", "--no-header", *extra],
        cwd=ROOT,
        capture_output=True,
        text=True,
    )
    return dict(
        path=path,
        rc=p.returncode,
        wall=time.perf_counter() - t0,
        tail=(p.stdout.strip().splitlines() or [""])[-1],
        out=p.stdout + p.stderr,
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("modules", nargs="*", help="test files (default: tests/test_*.py)")
    ap.add_argument("-j", type=int, default=min(2, os.cpu_count() or 1))
    ap.add_argument("--shuffle", action="store_true",
                    help="randomize module order (prints the seed)")
    ap.add_argument("--seed", type=int, default=None)
    args, extra = ap.parse_known_args()

    modules = args.modules or sorted(
        glob.glob(os.path.join(ROOT, "tests", "test_*.py"))
    )
    modules = [os.path.relpath(m, ROOT) for m in modules]
    if args.shuffle:
        seed = args.seed if args.seed is not None else random.randrange(10**6)
        print(f"shuffle seed: {seed}")
        random.Random(seed).shuffle(modules)

    t0 = time.perf_counter()
    results = []
    with ThreadPoolExecutor(max_workers=args.j) as ex:
        for r in ex.map(lambda m: run_module(m, extra), modules):
            status = "ok" if r["rc"] == 0 else f"FAIL rc={r['rc']}"
            print(f"{r['path']:<36s} {r['wall']:7.1f}s  {status}  {r['tail']}",
                  flush=True)
            results.append(r)
    wall = time.perf_counter() - t0

    failed = [r for r in results if r["rc"] != 0]
    # pytest rc 5 = no tests collected (e.g. a helper module) — not a failure
    failed = [r for r in failed if r["rc"] != 5]
    print(f"\n{len(results) - len(failed)}/{len(results)} modules passed "
          f"in {wall:.0f}s ({args.j} workers)")
    for r in failed:
        print(f"\n===== {r['path']} =====\n{r['out'][-4000:]}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
