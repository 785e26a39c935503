"""Pure-pandas reference implementation of the pipeline semantics.

This is the "reference-emitted triples" side of the north-rule P/R gate:
LLMAIx's semantics (stub grammar extraction + tolerant JSON repair +
umlaut-fold/fuzzy≥90 linking + first-wins canonicalization) executed
exhaustively on one machine — O(n²) candidate pairing, no LSH — so any
recall the Spark LSH blocking loses shows up in the gate.

Shares only the *deterministic kernels* (StubBackend, repair_and_parse,
ratio) with the Spark pipeline; the dataflow (union-find, pairing) is
independent.
"""

from __future__ import annotations

import pandas as pd

from llmaix_spark.functions.fuzzy import ratio
from llmaix_spark.functions.json_repair import repair_and_parse
from llmaix_spark.functions.masking import replace_umlauts
from llmaix_spark.operators.extraction import (
    DEFAULT_PROMPT,
    ExtractionConfig,
    StubBackend,
)


def norm_surface(s: str) -> str:
    import re

    return re.sub(r"\s+", " ", replace_umlauts(s.strip()).lower())


def extract_reference_triples(transcripts: pd.DataFrame) -> list[tuple]:
    """(conv_id, subj_surface, pred, obj_surface) via stub + repair."""
    t = transcripts.sort_values(["conv_id", "turn_idx"])
    conv = t.groupby("conv_id")["text"].apply(
        lambda s: " ".join(x if x is not None else "" for x in s)
    )
    be = StubBackend(ExtractionConfig())
    out = []
    for conv_id, text in conv.items():
        content, _truncated = be.complete([DEFAULT_PROMPT.format(report=text)])[0]
        d, _, _err = repair_and_parse(content)
        for tr in d.get("triples", []) or []:
            if tr.get("subj") and tr.get("obj"):
                out.append((conv_id, tr["subj"], tr["pred"], tr["obj"]))
    return out


class _UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-label wins — same total order as the Spark CC
            lo, hi = sorted((ra, rb))
            self.parent[hi] = lo


def exhaustive_canonical_map(norms: list[str], threshold: float = 90.0) -> dict[str, str]:
    """All-pairs fuzzy linking (no blocking) → norm → canonical min-norm."""
    uf = _UnionFind()
    uniq = sorted(set(norms))
    for i, a in enumerate(uniq):
        uf.find(a)
        for b in uniq[i + 1 :]:
            if ratio(a, b) >= threshold:
                uf.union(a, b)
    return {n: uf.find(n) for n in uniq}


def reference_canonical_triples(
    transcripts: pd.DataFrame, threshold: float = 90.0
) -> set[tuple]:
    """Distinct canonical (subj, pred, obj) — the gate's reference set."""
    raw = extract_reference_triples(transcripts)
    norms = [norm_surface(s) for _, s, _, _ in raw] + [
        norm_surface(o) for _, _, _, o in raw
    ]
    canon = exhaustive_canonical_map(norms, threshold)
    return {
        (canon[norm_surface(s)], p, canon[norm_surface(o)])
        for _, s, p, o in raw
    }
