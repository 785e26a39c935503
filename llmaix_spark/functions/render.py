"""Confusion-matrix rendering (M7) — dependency-free SVG.

The reference renders seaborn heatmaps to SVG files
(webapp/report_redaction/utils.py:271-345: row-normalized colors,
"count\\n(norm)" cell annotations, title + LLM/Ground-Truth axis labels).
Rendering is inherently a driver-side concern — the distributed part is
the counts (evaluation.multiclass_confusion / boolean_label_metrics) —
so this twin builds the same visual semantics with pure string SVG:
no matplotlib/seaborn/numpy, deterministic output, safe to call from a
driver summarizing a 100 TB run's small confusion matrix.
"""

from __future__ import annotations

import html

CELL = 110
PAD_LEFT = 90
PAD_TOP = 60
PAD_BOTTOM = 70


def _cell_color(frac: float) -> str:
    """Light→dark blue ramp over the row-normalized fraction (the
    reference's seaborn 'Blues' heatmap)."""
    frac = min(max(frac, 0.0), 1.0)
    r = round(247 - frac * (247 - 8))
    g = round(251 - frac * (251 - 48))
    b = round(255 - frac * (255 - 107))
    return f"rgb({r},{g},{b})"


def render_confusion_matrix_svg(
    matrix: list[list[float]],
    classes: list[str],
    title: str = "Confusion Matrix",
    xlabel: str = "LLM",
    ylabel: str = "Ground Truth",
) -> str:
    """counts[gt][pred] → SVG string. Row-normalized colors with a
    division-by-zero guard (reference utils.py:317-323); each cell is
    annotated `count` over `(fraction)` like the reference's annot
    strings."""
    n = len(matrix)
    assert n and all(len(r) == n for r in matrix), "matrix must be square"
    assert len(classes) == n, "one class label per row/column"
    width = PAD_LEFT + n * CELL + 20
    height = PAD_TOP + n * CELL + PAD_BOTTOM
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="sans-serif">',
        f'<text x="{width / 2}" y="24" text-anchor="middle" '
        f'font-size="16" font-weight="bold">{html.escape(title)}</text>',
    ]
    for i, row in enumerate(matrix):
        row_sum = sum(row) or 1.0  # zero rows render as all-zero fractions
        for j, count in enumerate(row):
            frac = count / row_sum
            x = PAD_LEFT + j * CELL
            y = PAD_TOP + i * CELL
            dark = frac > 0.5
            parts.append(
                f'<rect x="{x}" y="{y}" width="{CELL}" height="{CELL}" '
                f'fill="{_cell_color(frac)}" stroke="white"/>'
            )
            fill = "white" if dark else "black"
            cx, cy = x + CELL / 2, y + CELL / 2
            parts.append(
                f'<text x="{cx}" y="{cy - 6}" text-anchor="middle" '
                f'font-size="14" fill="{fill}">{count:g}</text>'
            )
            parts.append(
                f'<text x="{cx}" y="{cy + 14}" text-anchor="middle" '
                f'font-size="12" fill="{fill}">({frac:.2f})</text>'
            )
    for k, cls in enumerate(classes):
        cls_esc = html.escape(str(cls))
        parts.append(  # column header (predicted)
            f'<text x="{PAD_LEFT + k * CELL + CELL / 2}" y="{PAD_TOP - 8}" '
            f'text-anchor="middle" font-size="13">{cls_esc}</text>'
        )
        parts.append(  # row header (ground truth)
            f'<text x="{PAD_LEFT - 8}" y="{PAD_TOP + k * CELL + CELL / 2 + 4}" '
            f'text-anchor="end" font-size="13">{cls_esc}</text>'
        )
    parts.append(
        f'<text x="{PAD_LEFT + n * CELL / 2}" '
        f'y="{PAD_TOP + n * CELL + 34}" text-anchor="middle" '
        f'font-size="14">{html.escape(xlabel)}</text>'
    )
    parts.append(
        f'<text x="16" y="{PAD_TOP + n * CELL / 2}" text-anchor="middle" '
        f'font-size="14" transform="rotate(-90 16 {PAD_TOP + n * CELL / 2})"'
        f'>{html.escape(ylabel)}</text>'
    )
    parts.append("</svg>")
    return "\n".join(parts)


def confusion_matrix_svg_from_counts(
    tp: float,
    tn: float,
    fp: float,
    fn: float,
    labels: list[str] | None = None,
    title: str = "Confusion Matrix",
    xlabel: str = "LLM",
    ylabel: str = "Ground Truth",
) -> str:
    """Boolean CM layout [[tp, fn], [fp, tn]] (reference
    generate_confusion_matrix_from_counts, utils.py:308-345)."""
    return render_confusion_matrix_svg(
        [[tp, fn], [fp, tn]],
        labels or ["true", "false"],
        title,
        xlabel,
        ylabel,
    )


def confusion_matrix_svg_from_long(
    cm_long,
    title: str = "Confusion Matrix",
    xlabel: str = "LLM",
    ylabel: str = "Ground Truth",
) -> str:
    """Render from the distributed long-format CM
    (evaluation.multiclass_confusion output: label, gt, pred, n). The CM
    itself is tiny (|classes|²) — collecting it is the correct driver
    move; classes are the sorted union of gt/pred values."""
    rows = cm_long.select("gt", "pred", "n").collect()
    # NULL gt/pred (failed extraction, outer join) renders as a class of
    # its own instead of crashing sorted() on None < str
    label = lambda v: "(null)" if v is None else v  # noqa: E731
    classes = sorted({label(r["gt"]) for r in rows} | {label(r["pred"]) for r in rows})
    idx = {c: i for i, c in enumerate(classes)}
    m = [[0.0] * len(classes) for _ in classes]
    for r in rows:
        m[idx[label(r["gt"])]][idx[label(r["pred"])]] += r["n"]
    return render_confusion_matrix_svg(m, classes, title, xlabel, ylabel)
