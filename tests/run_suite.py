"""Full-suite runner: one pytest subprocess per test file.

Why not one `pytest tests` process: after a few hundred XLA:CPU
compilations in a single process (8 virtual devices, shard_map + x64
programs, the axon PJRT plugin loaded), the native compile path can
segfault — observed twice in round 3/4 full runs, each time at a
DIFFERENT late-suite test (`test_scene` during a cache read, `test_ring`
inside `backend_compile_and_load`), while every crashing test passes in
a fresh process. That is a cumulative-state native fault in the
XLA:CPU/plugin stack, not a framework bug; isolating files into their
own interpreters removes the accumulation and makes one fault unable to
kill the whole run. (The OTHER round-3 segfault — deserializing
machine-mismatched XLA:CPU AOT executables from the committed
.jax_cache — was a framework bug and is fixed: the persistent cache is
never enabled on the CPU backend, see mv_lm_icp_tpu/__init__.py.)

Usage: python tests/run_suite.py [-jN] [report_path]
Writes a one-line-per-file report + totals; exit 0 iff everything
passed.
"""
from __future__ import annotations

import concurrent.futures as cf
import glob
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def run_file(path: str):
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-m", "pytest", path, "-q",
         "-p", "no:cacheprovider"],
        capture_output=True, text=True, cwd=ROOT,
        env=dict(os.environ, MVICP_NO_COMPILE_CACHE="1"))
    out = (p.stdout or "") + (p.stderr or "")
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    summary = ""
    for ln in reversed(lines):
        if re.search(r"\d+ (passed|failed|error|skipped)", ln):
            summary = ln.strip()
            break
    if not summary:
        summary = lines[-1].strip() if lines else "(no output)"
    return p.returncode, summary, time.time() - t0, out


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    jobs = 3
    for a in list(argv):
        if a.startswith("-j"):
            jobs = int(a[2:])
            argv.remove(a)
    report_path = argv[0] if argv else None

    files = sorted(glob.glob(os.path.join(HERE, "test_*.py")))
    results = {}
    t0 = time.time()
    with cf.ThreadPoolExecutor(max_workers=jobs) as ex:
        futs = {ex.submit(run_file, f): f for f in files}
        for fut in cf.as_completed(futs):
            f = futs[fut]
            rc, summary, dt, out = fut.result()
            results[f] = (rc, summary, dt)
            status = "ok" if rc == 0 else f"FAIL(rc={rc})"
            print(f"{os.path.basename(f):28s} {status:10s} {dt:6.1f}s  "
                  f"{summary}", flush=True)
            if rc != 0:
                tail = "\n".join(out.strip().splitlines()[-25:])
                print(f"--- {f} output tail ---\n{tail}\n---", flush=True)

    total = time.time() - t0
    n_pass = sum(1 for rc, _, _ in results.values() if rc == 0)
    counts = [0, 0, 0, 0]  # passed, failed, skipped, errors
    for _, summary, _ in results.values():
        # collection errors print "N error(s)" — count them too, else a
        # file that errors during collection shows rc!=0 but adds 0 to
        # the totals and the headline understates breakage
        for n, kind in re.findall(r"(\d+) (passed|failed|skipped|error)",
                                  summary):
            counts[("passed", "failed", "skipped",
                    "error").index(kind)] += int(n)
    verdict = "GREEN" if n_pass == len(files) else "RED"
    lines = [
        f"suite: {verdict} — {n_pass}/{len(files)} files ok, "
        f"{counts[0]} passed / {counts[1]} failed / {counts[2]} skipped "
        f"/ {counts[3]} errors "
        f"in {total:.0f}s (one subprocess per file, -j{jobs})",
    ] + [
        f"  {os.path.basename(f):28s} "
        f"{'ok' if results[f][0] == 0 else 'FAIL':6s} "
        f"{results[f][2]:6.1f}s  {results[f][1]}"
        for f in files
    ]
    report = "\n".join(lines)
    print(report.splitlines()[0])
    if report_path:
        with open(report_path, "w") as fh:
            fh.write(__doc__.split("Usage:")[0].strip()
                     + "\n\n" + report + "\n")
        print(f"wrote {report_path}")
    return 0 if n_pass == len(files) else 1


if __name__ == "__main__":
    sys.exit(main())
