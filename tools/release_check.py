"""One-command release gate: everything that must be green before a tag.

Chains, in order, each in its own subprocess (own jax platform init, own
compilation-cache setup):

  1. native   — build the C++ layer (tokenizers + packer), `make -C native`
  2. tests    — the pytest suite on the 8-device virtual CPU mesh
                (`--tests fast` runs a ~90-second core subset; `full` is the
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
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# a ~90-second core subset for `--tests fast`: data framing, loss
# numerics, config invariants, serving. Model-forward parity and decode
# equivalence are NOT in this subset (their oracle files run minutes);
# the dryrun step partially compensates by executing train/eval/decode
# end-to-end on the virtual mesh. Use `--tests full` before a tag.
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
    """Run one gate step in its own PROCESS GROUP.

    On timeout, SIGKILL the whole group — not just the direct child.
    pytest/make/the dryrun re-exec spawn grandchildren; a surviving
    grandchild would keep running while the gate proceeds, violating the
    strictly-sequential/no-concurrent-JAX invariant (CLAUDE.md: host-load
    contention re-triggers the jaxlib SIGABRT and skews TPU numbers ~40%).
    """
    print(f"=== {name}: {' '.join(cmd)} ===", flush=True)
    t0 = time.monotonic()
    timed_out = False
    proc = subprocess.Popen(cmd, cwd=ROOT, env=_env(),
                            start_new_session=True)
    try:
        rc = proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        timed_out = True
        rc = -1
        print(f"=== TIMEOUT after {timeout:.0f}s: {name} — killing its "
              f"process group ===", flush=True)
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass
        proc.wait()
    dt = time.monotonic() - t0
    print(f"=== {'PASS' if rc == 0 else f'FAIL (rc={rc})'}: {name} "
          f"({dt:.1f}s) ===\n", flush=True)
    return {"step": name, "ok": rc == 0, "seconds": round(dt, 1),
            "timed_out": timed_out}


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

    results = []
    for s in steps:
        results.append(_run(*s))
        if results[-1]["timed_out"]:
            # A timed-out step means a killed process group; don't trust
            # the host state enough to keep going (especially into TPU
            # steps whose numbers assume an idle host) — fail the gate
            # now and report the remaining steps as skipped.
            skipped = [{"step": n, "ok": False, "seconds": 0.0,
                        "skipped_after_timeout": True}
                       for n, _, _ in steps[len(results):]]
            results.extend(skipped)
            break
    ok = all(r["ok"] for r in results)
    print(json.dumps({"release_check": "PASS" if ok else "FAIL",
                      "steps": results}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
