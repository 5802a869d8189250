"""Reading-order assembly: text runs → lines → page text.

Deterministic line clustering (the XY-cut-lite appropriate for the fixture
corpus — SURVEY.md §7.3 item 3): runs are grouped into lines by y within a
fixed epsilon, lines sorted by y descending (PDF origin is bottom-left),
runs within a line by x ascending with pinned tie-breaks, adjacent runs
joined with "" when they abut (fragmented table cells like "Amo"/"unt")
or " " when a visible gap separates them.
"""

from __future__ import annotations

from .content import TextRun

LINE_EPSILON = 2.0  # max |Δy| for two runs to share a line
GAP_FACTOR = 0.35  # gap > GAP_FACTOR*size → insert a space
CHAR_WIDTH_FACTOR = 0.5  # must match TextInterpreter's advance estimate


def assemble_lines(runs: list[TextRun]) -> list[list[TextRun]]:
    if not runs:
        return []
    # stable sort: y desc, then x asc, then original emit order (implicit)
    indexed = sorted(range(len(runs)), key=lambda i: (-runs[i].y, runs[i].x, i))
    lines: list[list[TextRun]] = []
    current: list[TextRun] = []
    current_y = None
    for i in indexed:
        r = runs[i]
        if current_y is None or abs(r.y - current_y) <= LINE_EPSILON:
            current.append(r)
            current_y = r.y if current_y is None else current_y
        else:
            lines.append(current)
            current = [r]
            current_y = r.y
    if current:
        lines.append(current)
    return lines


def line_text(line: list[TextRun]) -> str:
    """Join a line's runs: no separator when runs abut, single space otherwise."""
    parts: list[str] = []
    prev_end_x: float | None = None
    for r in sorted(line, key=lambda r: r.x):
        if prev_end_x is not None:
            gap = r.x - prev_end_x
            if gap > GAP_FACTOR * r.size:
                parts.append(" ")
        parts.append(r.text)
        prev_end_x = r.x + CHAR_WIDTH_FACTOR * r.size * len(r.text)
    return "".join(parts)


MIN_XCUT_GAP = 18.0  # min horizontal whitespace (pts) to split columns
MIN_BLOCK_RUNS = 2  # don't split blocks below this many runs


def _xy_cut(runs: list[TextRun], depth: int = 0) -> list[list[TextRun]]:
    """Recursive XY-cut: split the run set at the widest vertical whitespace
    band (column gap) wider than MIN_XCUT_GAP; left block reads first.
    Horizontal (row) cuts are handled by line clustering afterwards, so only
    X cuts recurse here. Deterministic: widest gap wins, ties → leftmost."""
    if depth > 4 or len(runs) < MIN_BLOCK_RUNS:
        return [runs]
    # estimate each run's x extent
    spans = sorted(
        (r.x, r.x + CHAR_WIDTH_FACTOR * r.size * len(r.text)) for r in runs
    )
    # merge into occupied x-intervals; find the widest interior gap
    best_gap, best_split = 0.0, None
    cur_end = spans[0][1]
    for x0, x1 in spans[1:]:
        if x0 > cur_end:
            gap = x0 - cur_end
            if gap > best_gap:
                best_gap, best_split = gap, (cur_end + x0) / 2.0
        cur_end = max(cur_end, x1)
    if best_split is None or best_gap < MIN_XCUT_GAP:
        return [runs]
    left = [r for r in runs if r.x < best_split]
    right = [r for r in runs if r.x >= best_split]
    if not left or not right:
        return [runs]
    return _xy_cut(left, depth + 1) + _xy_cut(right, depth + 1)


def page_text(runs: list[TextRun], multi_column: bool = True) -> str:
    """Full page text in reading order.

    XY-cut first (columns read left-to-right, each top-to-bottom), then line
    clustering within each block; lines joined with '\\n'. A cut only
    triggers when a genuine column gap exists AND the blocks vertically
    overlap (side-by-side columns) — label/value rows on the same baseline
    (the claim-form table) stay merged by line clustering instead.
    """
    blocks = _xy_cut(runs) if multi_column else [runs]
    if len(blocks) > 1:
        # only treat as columns if blocks overlap vertically; otherwise fall
        # back to whole-page line clustering (a table, not columns)
        def y_range(b):
            ys = [r.y for r in b]
            return min(ys), max(ys)

        ranges = [y_range(b) for b in blocks]
        overlap = all(
            min(r1[1], r2[1]) - max(r1[0], r2[0]) > 0.5 * (r1[1] - r1[0] + 1e-6)
            for r1, r2 in zip(ranges, ranges[1:])
        )
        tall = all((r[1] - r[0]) > 40.0 for r in ranges)
        # table-vs-columns: if most lines of adjacent blocks share baselines
        # (|Δy| ≤ LINE_EPSILON), the blocks are table columns whose rows must
        # merge — pdfplumber-style semantics the golden contract pins.
        aligned = False
        if overlap and tall:
            ys_per_block = [sorted({round(r.y, 1) for r in b}) for b in blocks]
            a, b = ys_per_block[0], ys_per_block[1]
            hits = sum(1 for y in a if any(abs(y - y2) <= LINE_EPSILON for y2 in b))
            aligned = hits >= 0.6 * max(len(a), 1)
        if not (overlap and tall) or aligned:
            blocks = [runs]
    parts: list[str] = []
    for block in blocks:
        lines = [line_text(line) for line in assemble_lines(block)]
        lines = [ln for ln in lines if ln.strip()]
        if lines:
            parts.append("\n".join(lines))
    return "\n".join(parts)
