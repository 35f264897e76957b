"""Run the big-sharded-compile test modules in a FRESH subprocess.

Why: the jaxlib CPU runtime deterministically SIGABRTs when a large
sharded compile (test_zero1's (4,2) mesh) lands LATE in a long pytest
process — after hundreds of accumulated compiled programs — while the
same module is green standalone (r03 bisect, CLAUDE.md). Round 3
mitigated this with a collection-order hoist (zero1 first), which made
suite health depend on collection order (VERDICT r03 weak #4). The
robust fix: the heavy modules live in ``tests/isolated/`` (excluded from
in-process collection by ``conftest.collect_ignore``) and execute here in
a brand-new interpreter whose compile-cache state is empty by
construction — immune to whatever ran before in the parent, in any order.

The parent stays idle while the child runs, so there is never more than
one ACTIVE JAX process (CLAUDE.md: concurrent active JAX processes
re-trigger the SIGABRT via host memory pressure).
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ISOLATED = sorted(
    f for f in os.listdir(os.path.join(ROOT, "tests", "isolated"))
    if f.startswith("test_") and f.endswith(".py")
)


@pytest.mark.parametrize("module", ISOLATED)
def test_isolated_module_green_in_fresh_process(module):
    env = dict(os.environ, MMTG_RUN_ISOLATED="1")
    # APPEND to PYTHONPATH (CLAUDE.md rule 8: replacing it drops the axon
    # backend discovery; harmless here on CPU but the rule is absolute)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (ROOT, env.get("PYTHONPATH", "")) if p
    )
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join("tests", "isolated", module), "-q"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, (
        f"{module} failed in its fresh process (rc={r.returncode}):\n"
        f"{r.stdout[-4000:]}\n{r.stderr[-2000:]}"
    )
