#!/usr/bin/env python
"""Run the on-chip (real TPU) parity suite and record a JSON artifact.

The CPU-f64 CI cannot catch on-chip numerics regressions (e.g. the bf16
DEFAULT-matmul-precision truncation that once put 3.4e-3 into receiver
traces — CLAUDE.md), so the real-chip parity tests in
tests/test_tpu_onchip.py must run as part of every round:

    python tools/run_onchip.py [ONCHIP_rNN.json]

Runs `DEVITO_FWI_TPU_ONCHIP_TESTS=1 pytest tests/test_tpu_onchip.py -m slow`
against the session's real TPU backend and writes the per-test outcomes
plus wall time to the artifact (default ONCHIP.json at the repo root).
Exit code mirrors pytest's.
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(REPO, "ONCHIP.json")
    env = dict(os.environ, DEVITO_FWI_TPU_ONCHIP_TESTS="1")
    cmd = [sys.executable, "-m", "pytest", "tests/test_tpu_onchip.py",
           "-m", "slow", "-v", "--no-header", "-rA"]
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                              text=True, timeout=3600)
    except subprocess.TimeoutExpired as e:
        # the exact scenario the timeout exists for (tunnel hang) must
        # still produce an artifact + JSON line
        wall = time.time() - t0
        artifact = {"suite": "tests/test_tpu_onchip.py", "rc": -1,
                    "ok": False, "wall_s": round(wall, 1), "tests": {},
                    "tail": "TIMEOUT after 3600s (TPU tunnel hang?): "
                            + str(e)[-500:]}
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=2)
            f.write("\n")
        print(json.dumps({k: artifact[k] for k in
                          ("rc", "ok", "wall_s", "tests")}))
        return 1
    wall = time.time() - t0
    tests = {}
    for line in proc.stdout.splitlines():
        m = re.match(r"(tests/test_tpu_onchip\.py::\S+)\s+"
                     r"(PASSED|FAILED|SKIPPED|ERROR)", line)
        if m:
            tests[m.group(1).split("::", 1)[1]] = m.group(2)
    artifact = {
        "suite": "tests/test_tpu_onchip.py",
        "rc": proc.returncode,
        "ok": proc.returncode == 0,
        "wall_s": round(wall, 1),
        "tests": tests,
        "tail": "\n".join(proc.stdout.splitlines()[-8:]),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
        f.write("\n")
    print(json.dumps({k: artifact[k] for k in
                      ("rc", "ok", "wall_s", "tests")}))
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-2000:])
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
