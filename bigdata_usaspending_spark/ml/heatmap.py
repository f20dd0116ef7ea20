"""Annotated correlation-heatmap artifact (reference:
app/machine_learning_models.py:194-214 rendered
static/images/correlation_heatmap.png via matplotlib imshow + per-cell text).

This container has no plotting library, so the same artifact is emitted as
a dependency-free SVG: viridis-mapped cells normalized to the matrix's
min/max (imshow's default), per-cell annotations switching to white ink
when |r| > 0.5 (the reference's rule), rotated x labels, and a colorbar.
SVG is deterministic text — also easier to golden-test than a PNG.
"""

from __future__ import annotations

from collections.abc import Sequence

# viridis control points (public colormap; linear interpolation between them)
_VIRIDIS = [
    (0.00, (68, 1, 84)),
    (0.25, (59, 82, 139)),
    (0.50, (33, 145, 140)),
    (0.75, (94, 201, 98)),
    (1.00, (253, 231, 37)),
]

_CELL = 56
_LEFT = 150   # y-label gutter
_TOP = 50     # title gutter
_BAR_W = 18   # colorbar width
_BAR_GAP = 28


def _viridis(t: float) -> str:
    t = min(1.0, max(0.0, t))
    for (t0, c0), (t1, c1) in zip(_VIRIDIS, _VIRIDIS[1:]):
        if t <= t1:
            f = 0.0 if t1 == t0 else (t - t0) / (t1 - t0)
            r, g, b = (round(a + (b_ - a) * f) for a, b_ in zip(c0, c1))
            return f"#{r:02x}{g:02x}{b:02x}"
    return "#fde725"


def correlation_heatmap_svg(matrix: Sequence[Sequence[float]], labels: Sequence[str]) -> str:
    n = len(labels)
    flat = [v for row in matrix for v in row]
    lo, hi = min(flat), max(flat)
    span = (hi - lo) or 1.0

    width = _LEFT + n * _CELL + _BAR_GAP + _BAR_W + 60
    height = _TOP + n * _CELL + 110
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'font-family="sans-serif">',
        '<defs><linearGradient id="cbar" x1="0" y1="1" x2="0" y2="0">',
    ]
    for t, _ in _VIRIDIS:
        parts.append(f'<stop offset="{t}" stop-color="{_viridis(t)}"/>')
    parts.append("</linearGradient></defs>")
    parts.append(
        f'<text x="{_LEFT + n * _CELL / 2}" y="28" text-anchor="middle" font-size="16">'
        "Correlation Heatmap with Annotations</text>"
    )
    for i in range(n):           # row
        for j in range(n):       # col
            v = float(matrix[i][j])
            x, y = _LEFT + j * _CELL, _TOP + i * _CELL
            ink = "white" if abs(v) > 0.5 else "black"
            parts.append(
                f'<rect x="{x}" y="{y}" width="{_CELL}" height="{_CELL}" '
                f'fill="{_viridis((v - lo) / span)}"/>'
            )
            parts.append(
                f'<text x="{x + _CELL / 2}" y="{y + _CELL / 2 + 4}" text-anchor="middle" '
                f'font-size="11" fill="{ink}">{v:.2f}</text>'
            )
    for i, label in enumerate(labels):
        y = _TOP + i * _CELL + _CELL / 2 + 4
        parts.append(
            f'<text x="{_LEFT - 8}" y="{y}" text-anchor="end" font-size="11">{label}</text>'
        )
        x = _LEFT + i * _CELL + _CELL / 2
        ty = _TOP + n * _CELL + 14
        parts.append(
            f'<text x="{x}" y="{ty}" text-anchor="end" font-size="11" '
            f'transform="rotate(-45 {x} {ty})">{label}</text>'
        )
    bx = _LEFT + n * _CELL + _BAR_GAP
    parts.append(
        f'<rect x="{bx}" y="{_TOP}" width="{_BAR_W}" height="{n * _CELL}" fill="url(#cbar)"/>'
    )
    parts.append(
        f'<text x="{bx + _BAR_W + 6}" y="{_TOP + 10}" font-size="11">{hi:.2f}</text>'
    )
    parts.append(
        f'<text x="{bx + _BAR_W + 6}" y="{_TOP + n * _CELL}" font-size="11">{lo:.2f}</text>'
    )
    parts.append("</svg>")
    return "\n".join(parts)


def write_correlation_heatmap(
    matrix: Sequence[Sequence[float]], labels: Sequence[str], path: str
) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(correlation_heatmap_svg(matrix, labels))
