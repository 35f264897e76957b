"""Dump the optimized HLO of the b256 train step and print the definitions
of named fusions (to pair trace op names with actual computation).

Usage: python tools/dump_train_hlo.py [--ops fusion.1149,convert_reduce_fusion.48]
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mmtg_tpu.utils.platform import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default="/tmp/train_step_hlo.txt")
    ap.add_argument("--ops", default="")
    args = ap.parse_args()

    from tools.trace_train import build_step
    import jax

    step_fn, state, const, batch, stage = build_step(
        args.batch, "bfloat16", "auto")
    lowered = step_fn.lower(state, const, batch, stage)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt)} bytes)")
    if args.ops:
        lines = txt.splitlines()
        for op in args.ops.split(","):
            op = op.strip()
            pat = re.compile(r"%" + re.escape(op) + r"\b")
            for i, ln in enumerate(lines):
                if pat.search(ln) and ("= " in ln):
                    print(f"\n### {op}\n{ln.strip()[:2000]}")
                    break


if __name__ == "__main__":
    main()
