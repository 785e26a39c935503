"""Round-tag inference for self-stamped artifacts
(CORRECTNESS_SELF_r{N}.json, BENCH_SELF_r{N}.json) — ONE shared
implementation for scripts/preflight.py and bench.py (review finding:
the two copies carried a max(driver+1, self_max) guard that was
provably dead — SELF tags are only ever created at driver_max+1, so
the max never changed the answer, while its docstring claimed it did).

Contract (honest version):
  * tag = max(driver CORRECTNESS_r*/BENCH_r*) + 1 — the round in
    progress. Re-runs within a round recompute the same tag, so the
    SELF file is overwritten, never bumped.
  * the ONE ambiguous state — the driver commits this round's r{N}
    files while the builder session is still running — is structurally
    indistinguishable from the start of round N+1 by file tags alone
    (both show driver_max == N with SELF_r{N} present). A re-run there
    WILL write SELF_r{N+1}; export SPARK_GRAFT_ROUND to pin the tag
    when operating across that boundary.
"""

from __future__ import annotations

import glob
import os
import re


def infer_round_tag(repo: str) -> str:
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        # normalize "5" -> "05" so artifact names match the driver's
        # zero-padded convention regardless of how the round was typed
        return f"{int(env):02d}" if env.isdigit() else env

    def tags(pattern: str) -> list[int]:
        return [
            int(m.group(1))
            for p in glob.glob(os.path.join(repo, pattern))
            if (m := re.search(r"_r(\d+)\.json$", p))
        ]

    driver = tags("CORRECTNESS_r*.json") + tags("BENCH_r*.json")
    return f"{(max(driver) + 1) if driver else 1:02d}"
