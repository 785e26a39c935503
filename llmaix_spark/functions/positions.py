"""F9: diff-based position mapping between two text variants.

The reference uses difflib to count removed characters up to a position,
mapping span offsets between OCR'd and cleaned text
(webapp/report_redaction/tests/test_text_matching.py:3-28). Used when
annotation spans were made against a different rendering of the same
document than the one being scored."""

from __future__ import annotations

from difflib import SequenceMatcher


def position_map(source: str, target: str) -> list[int]:
    """For every char index in `source`, the corresponding index in
    `target` (insertion point if the char was removed)."""
    sm = SequenceMatcher(None, source, target, autojunk=False)
    mapping = [0] * (len(source) + 1)
    for a, b, size in sm.get_matching_blocks():
        for k in range(size + 1):
            if a + k <= len(source):
                mapping[a + k] = b + k
    # fill gaps (chars only in source) with the next mapped position
    last = 0
    for i in range(len(mapping)):
        if mapping[i] == 0 and i > 0:
            mapping[i] = last
        else:
            last = mapping[i]
    return mapping


def map_span(source: str, target: str, begin: int, end: int) -> tuple[int, int]:
    """Map a [begin, end) span from source offsets to target offsets."""
    m = position_map(source, target)
    return m[max(0, min(begin, len(source)))], m[max(0, min(end, len(source)))]
