"""One-command hardware validation: run every on-chip kernel validator.

The unit tests prove kernel numerics in interpret mode on CPU; these
validators check the actual Mosaic lowering on the real TPU. This wrapper
runs them all in subprocesses (each owns its compilation-cache setup and
jax platform init) and prints one PASS/FAIL line each plus a summary —
the "hardware CI" entry point after touching any Pallas kernel.

Usage: python tools/validate_on_tpu.py [--batch 256]
Exit code 0 only if every validator passed.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

VALIDATORS = [
    ("decode kernels (fp/int8/int4 x plain/append, unified builder)",
     "validate_pallas_on_tpu.py", []),
    ("whole-step decode megakernel (attn_impl='fused')",
     "validate_megakernel_on_tpu.py", ["--skip-bench"]),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    failures = 0
    for name, script, extra in VALIDATORS:
        cmd = [sys.executable, os.path.join(here, script),
               "--batch", str(args.batch)] + extra
        print(f"=== {name} ===", flush=True)
        # APPEND to PYTHONPATH — the axon TPU plugin is discovered through
        # the inherited PYTHONPATH (/root/.axon_site); replacing it loses
        # the backend ("'axon' is not in the list of known backends")
        pythonpath = os.pathsep.join(
            p for p in (root, os.environ.get("PYTHONPATH", "")) if p
        )
        rc = subprocess.run(
            cmd, cwd=root,
            env=dict(os.environ, PYTHONPATH=pythonpath),
        ).returncode
        print(f"=== {'PASS' if rc == 0 else f'FAIL (rc={rc})'}: {name} ===",
              flush=True)
        failures += rc != 0
    print(f"\n{len(VALIDATORS) - failures}/{len(VALIDATORS)} validators passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
