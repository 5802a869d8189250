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


def page_text(runs: list[TextRun]) -> str:
    """Full page text: lines joined with '\\n', stripped of trailing blanks."""
    lines = [line_text(line) for line in assemble_lines(runs)]
    lines = [ln for ln in lines if ln.strip()]
    return "\n".join(lines)
