"""One-command release gate: everything that must be green before a tag.

Chains, in order, each in its own subprocess (own jax platform init, own
compilation-cache setup):

  1. native   — build the C++ layer (tokenizers + packer), `make -C native`
  2. tests    — the pytest suite on the 8-device virtual CPU mesh
                (`--tests fast` runs a ~1-minute core subset; `full` is the
                whole suite, ~25-30 min — see CLAUDE.md)
  3. dryrun   — `__graft_entry__.dryrun_multichip(8)`: DP/TP/PP train +
                eval + sharded decode on virtual meshes
  4. validate — every on-chip Pallas validator (real TPU; skipped with
                `--no-tpu`)
  5. bench    — a short `bench.py` smoke on the real TPU (skipped with
                `--no-tpu`); sanity-checks the headline path end-to-end,
                NOT a number to quote (use the full bench for that)

Steps run strictly sequentially — the suite and any TPU work must never
overlap other JAX processes (CLAUDE.md: host-load contention costs ~40%
measured throughput and can re-trigger the jaxlib SIGABRT).

Usage:
  python tools/release_check.py                 # full gate
  python tools/release_check.py --tests fast    # quick pre-commit gate
  python tools/release_check.py --no-tpu        # host-only (no tunnel)

Exit code 0 only if every selected step passed; prints one PASS/FAIL line
per step plus a JSON summary line the caller can parse.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# a ~1-minute core subset for `--tests fast`: one file per load-bearing
# surface (data framing, model parity, decode equivalence, serving).
FAST_TESTS = [
    "tests/test_data.py",
    "tests/test_loss.py",
    "tests/test_configs.py",
    "tests/test_serve.py",
]


def _env() -> dict:
    # APPEND to PYTHONPATH — the axon TPU plugin is discovered through the
    # inherited PYTHONPATH (/root/.axon_site); replacing it loses the
    # backend ("'axon' is not in the list of known backends").
    pythonpath = os.pathsep.join(
        p for p in (ROOT, os.environ.get("PYTHONPATH", "")) if p
    )
    return dict(os.environ, PYTHONPATH=pythonpath)


def _run(name: str, cmd: list, timeout: float) -> dict:
    print(f"=== {name}: {' '.join(cmd)} ===", flush=True)
    t0 = time.monotonic()
    try:
        rc = subprocess.run(cmd, cwd=ROOT, env=_env(),
                            timeout=timeout).returncode
    except subprocess.TimeoutExpired:
        rc = -1
        print(f"=== TIMEOUT after {timeout:.0f}s: {name} ===", flush=True)
    dt = time.monotonic() - t0
    print(f"=== {'PASS' if rc == 0 else f'FAIL (rc={rc})'}: {name} "
          f"({dt:.1f}s) ===\n", flush=True)
    return {"step": name, "ok": rc == 0, "seconds": round(dt, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tests", choices=("full", "fast", "none"),
                    default="full")
    ap.add_argument("--no-tpu", action="store_true",
                    help="skip the real-TPU steps (validators + bench)")
    args = ap.parse_args()

    steps = [("native", [
        "make", "-C", os.path.join(ROOT, "native")], 600.0)]
    if args.tests != "none":
        sel = FAST_TESTS if args.tests == "fast" else ["tests/"]
        steps.append(("tests", [
            sys.executable, "-m", "pytest", *sel, "-q"], 3600.0))
    steps.append(("dryrun", [
        sys.executable, "-c",
        "import __graft_entry__ as g; g.dryrun_multichip(8)"], 1800.0))
    if not args.no_tpu:
        steps.append(("validate", [
            sys.executable, os.path.join(HERE, "validate_on_tpu.py")],
            1800.0))
        steps.append(("bench", [
            sys.executable, os.path.join(ROOT, "bench.py"),
            "--runs", "3", "--skip-baseline"], 1800.0))

    results = [_run(*s) for s in steps]
    ok = all(r["ok"] for r in results)
    print(json.dumps({"release_check": "PASS" if ok else "FAIL",
                      "steps": results}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
