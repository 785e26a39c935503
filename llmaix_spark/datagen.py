"""Deterministic synthetic transcripts generator (seed=42, sf-scalable).

Produces the pipeline-specific fixtures from FIXTURES.md §1/§4:

  transcripts(conv_id, turn_idx, role, text, tool, ts)   — the input table
  triples_ref(conv_id, subj, pred, obj)                  — embedded ground truth

Generation requirements (FIXTURES.md): power-law conversation lengths
(1..50 turns), hot entities in ~10% of conversations (skew for the salted
CC test), surface-form variants (case change, umlaut/ASCII pairs per
reference webapp/llm_processing/utils.py:12-36, 1-char typos that clear the
fuzzy threshold 90 per webapp/report_redaction/utils.py:413-433), and ~2%
empty/garbage turns (the empty-predicate path,
webapp/llm_processing/utils.py:147-169).

Everything is derived from numpy's seeded PCG64 — same sf → same bytes.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import numpy as np
import pandas as pd

SEED = 42

# predicate phrase → canonical predicate (the de-facto extraction grammar)
PREDICATES = {
    "works at": "works_at",
    "lives in": "lives_in",
    "manages": "manages",
    "uses": "uses",
    "visited": "visited",
}
PRED_PHRASES = list(PREDICATES)

_FIRST = [
    "Anna", "Björn", "Clara", "Dörte", "Emil", "Frieda", "Günther", "Heike",
    "Ingo", "Jürgen", "Katrin", "Lukas", "Marlene", "Norbert", "Ottilie",
    "Peter", "Quirin", "Rosa", "Sören", "Theresa", "Ulrich", "Viktor",
    "Wiebke", "Xaver", "Yvonne", "Zacharias",
]
_LAST = [
    "Müller", "Schäfer", "Örtel", "Weissgerber", "Großmann", "Hoffmann",
    "Kleinschmidt", "Lindenberg", "Neumann", "Obermaier", "Petersen",
    "Quandt", "Rosenthal", "Steinbach", "Thalberg", "Untermann",
    "Vogelsang", "Wackernagel", "Zimmermann", "Bachmeier",
]
_ORG_A = [
    "Acme", "Globex", "Initech", "Umbrella", "Vandelay", "Wonka", "Stark",
    "Wayne", "Tyrell", "Cyberdyne", "Aperture", "Rekall", "Soylent",
    "Gringotts", "Monarch",
]
_ORG_B = [
    "Corporation", "Industries", "Laboratories", "Analytics", "Logistics",
    "Systems", "Holdings", "Partners", "Institute", "Foundation",
]
_CITIES = [
    "Düsseldorf", "München", "Köln", "Würzburg", "Osnabrück", "Lübeck",
    "Nürnberg", "Göttingen", "Saarbrücken", "Tübingen", "Heidelberg",
    "Regensburg", "Flensburg", "Paderborn", "Oldenburg",
]
_FILLER = [
    "ok", "thanks", "let me check", "as discussed", "per the notes",
    "for context", "noted", "will do", "sounds good", "confirming",
]
_TOOLS = ["search", "calendar", "crm", "wiki", None, None, None]


def _person_pool(n: int, rng: np.random.Generator) -> list[str]:
    combos = [(f, l) for f in _FIRST for l in _LAST]
    idx = rng.permutation(len(combos))[:n]
    return [f"{combos[i][0]} {combos[i][1]}" for i in idx]


def _org_pool(n: int, rng: np.random.Generator) -> list[str]:
    combos = [(a, b) for a in _ORG_A for b in _ORG_B]
    idx = rng.permutation(len(combos))[:n]
    return [f"{combos[i][0]} {combos[i][1]}" for i in idx]


def _typo(name: str, rng: np.random.Generator) -> str:
    """One interior-char substitution; only applied to names long enough
    that one edit keeps normalized-Levenshtein ratio ≥ 90."""
    i = int(rng.integers(1, len(name) - 1))
    ch = name[i]
    if not ch.isalpha():
        i += 1
        ch = name[i]
    rep = "x" if ch.lower() != "x" else "y"
    rep = rep.upper() if ch.isupper() else rep
    return name[:i] + rep + name[i + 1 :]


def _surface(name: str, rng: np.random.Generator) -> str:
    """Realize a surface form: canonical / umlaut-translit / lowercase /
    1-char typo, with probabilities tuned so linking has real work."""
    r = rng.random()
    if r < 0.70:
        return name
    if r < 0.85 and any(u in name for u in "äöüÄÖÜß"):
        from llmaix_spark.functions.masking import replace_umlauts

        return replace_umlauts(name)
    if r < 0.90:
        return name.lower()
    if len(name) >= 12:
        return _typo(name, rng)
    return name


def generate_transcripts(sf: float, seed: int = SEED) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (transcripts_df, triples_ref_df) for a scale factor.

    sf=0.001 → 500 convs (~6k turns); sf scales conversations linearly.
    """
    rng = np.random.default_rng(seed)
    n_convs = max(10, int(500_000 * sf))
    n_persons = max(20, int(80 * np.sqrt(n_convs / 500)))
    n_orgs = max(15, int(40 * np.sqrt(n_convs / 500)))
    persons = _person_pool(min(n_persons, len(_FIRST) * len(_LAST)), rng)
    orgs = _org_pool(min(n_orgs, len(_ORG_A) * len(_ORG_B)), rng)
    hot_persons = persons[:3]  # hot entities: ~10% of convs each (skew)

    conv_lengths = np.clip(rng.zipf(1.6, n_convs), 1, 50)
    base_ts = int(datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp())

    rows: list[tuple] = []
    gt: list[tuple] = []
    for c in range(n_convs):
        conv_id = f"conv{c:08d}"
        n_turns = int(conv_lengths[c])
        t0 = base_ts + c * 3600
        use_hot = rng.random() < 0.30
        for t in range(n_turns):
            role = ("user", "assistant")[t % 2]
            tool = None
            if rng.random() < 0.05:
                role = "tool"
                tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))]
            ts = t0 + t * 37
            r = rng.random()
            if r < 0.02:
                text = ["", "?", "   "][int(rng.integers(0, 3))]
            else:
                parts = [_FILLER[int(rng.integers(0, len(_FILLER)))]]
                if rng.random() < 0.55:
                    if use_hot and rng.random() < 0.5:
                        subj = hot_persons[int(rng.integers(0, len(hot_persons)))]
                    else:
                        subj = persons[int(rng.integers(0, len(persons)))]
                    phrase = PRED_PHRASES[int(rng.integers(0, len(PRED_PHRASES)))]
                    pred = PREDICATES[phrase]
                    if phrase in ("lives in", "visited"):
                        obj = _CITIES[int(rng.integers(0, len(_CITIES)))]
                    else:
                        obj = orgs[int(rng.integers(0, len(orgs)))]
                    s_surf = _surface(subj, rng)
                    o_surf = _surface(obj, rng)
                    parts.append(f"{s_surf} {phrase} {o_surf}.")
                    gt.append((conv_id, subj, pred, obj))
                text = " ".join(parts)
            rows.append((conv_id, t, role, text, tool, ts))

    tdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    tdf["turn_idx"] = tdf["turn_idx"].astype("int32")
    tdf["ts"] = pd.to_datetime(tdf["ts"], unit="s", utc=True).dt.tz_localize(None)
    gdf = pd.DataFrame(gt, columns=["conv_id", "subj", "pred", "obj"]).drop_duplicates()
    return tdf, gdf


def ensure_transcripts(sf: float, out_dir: str, seed: int = SEED) -> str:
    """Write transcripts.parquet + triples_ref.parquet under out_dir/sf{sf}
    if absent; return the directory path. Cached across runs; the cache
    key includes a non-default seed (otherwise a seed-7 request would
    silently return cached seed-42 data)."""
    tag = f"sf{sf}" if seed == SEED else f"sf{sf}_seed{seed}"
    d = os.path.join(out_dir, tag)
    tpath = os.path.join(d, "transcripts.parquet")
    gpath = os.path.join(d, "triples_ref.parquet")
    if os.path.exists(tpath) and os.path.exists(gpath):
        return d
    os.makedirs(d, exist_ok=True)
    tdf, gdf = generate_transcripts(sf, seed)
    # Spark cannot read TIMESTAMP(NANOS) parquet — coerce to micros
    tdf.to_parquet(tpath, index=False, coerce_timestamps="us")
    gdf.to_parquet(gpath, index=False)
    return d
