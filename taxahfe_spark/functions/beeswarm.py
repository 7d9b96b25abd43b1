"""S9: SHAP beeswarm artifact as a standalone SVG.

The reference renders a ggplot/shapviz beeswarm to PDF (lib/shap_funcs.R:
104-111, cmd/diet_ml.R --shap). No plotting library ships in this
environment, so the analog is a dependency-free SVG writer: one horizontal
band per top-k feature (ordered by mean |phi|), one dot per explained row
at x = its SHAP value, stacked vertically within the band where values
crowd (the "swarm"), colored by the row's feature-value percentile
(blue = low, red = high). Deterministic: no randomness, layout depends
only on the inputs.
"""

from __future__ import annotations

import numpy as np

_W, _ROW_H, _PAD_L, _PAD_R, _PAD_V = 760, 46, 190, 70, 40
_R = 2.6  # dot radius
_LOW, _HIGH = (59, 130, 246), (239, 68, 68)  # blue -> red


def _color(frac: float) -> str:
    r = int(_LOW[0] + (_HIGH[0] - _LOW[0]) * frac)
    g = int(_LOW[1] + (_HIGH[1] - _LOW[1]) * frac)
    b = int(_LOW[2] + (_HIGH[2] - _LOW[2]) * frac)
    return f"rgb({r},{g},{b})"


def _swarm_offsets(xs: np.ndarray, span: float) -> np.ndarray:
    """Vertical stacking: bin the x positions; within a bin the k-th dot
    sits at alternating +/- multiples of the dot diameter, clipped to the
    band half-height."""
    order = np.argsort(xs, kind="stable")
    bins = np.floor((xs - xs.min()) / max(span / 60.0, 1e-9)).astype(np.int64)
    dy = np.zeros(len(xs))
    seen: dict[int, int] = {}
    for i in order:
        k = seen.get(int(bins[i]), 0)
        seen[int(bins[i])] = k + 1
        off = ((k + 1) // 2) * (2 * _R + 0.6) * (1 if k % 2 else -1)
        half = _ROW_H / 2 - _R - 1
        dy[i] = float(np.clip(off, -half, half))
    return dy


def beeswarm_svg(
    phi: np.ndarray,
    X: np.ndarray,
    feature_cols: list[str],
    top_k: int = 10,
) -> str:
    """(n, p) SHAP matrix + matching feature matrix -> SVG text."""
    phi = np.asarray(phi, dtype=np.float64)
    X = np.asarray(X, dtype=np.float64)
    order = np.argsort(-np.abs(phi).mean(axis=0), kind="stable")[:top_k]
    lo = float(min(phi[:, order].min(), 0.0))
    hi = float(max(phi[:, order].max(), 0.0))
    span = (hi - lo) or 1.0
    plot_w = _W - _PAD_L - _PAD_R
    height = _PAD_V * 2 + _ROW_H * len(order)

    def sx(v: float) -> float:
        return _PAD_L + (v - lo) / span * plot_w

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
        f'height="{height}" font-family="sans-serif" font-size="12">',
        f'<rect width="{_W}" height="{height}" fill="white"/>',
        f'<text x="{_PAD_L}" y="22" font-size="14" font-weight="bold">'
        f"SHAP beeswarm (top {len(order)} features)</text>",
        # zero line
        f'<line x1="{sx(0):.1f}" y1="{_PAD_V}" x2="{sx(0):.1f}" '
        f'y2="{height - _PAD_V}" stroke="#888" stroke-dasharray="4 3"/>',
        f'<text x="{sx(0):.1f}" y="{height - _PAD_V + 16}" '
        f'text-anchor="middle" fill="#555">0</text>',
        f'<text x="{_PAD_L + plot_w / 2:.1f}" y="{height - 8}" '
        f'text-anchor="middle" fill="#555">SHAP value (impact on model '
        f"output)</text>",
    ]
    for row, j in enumerate(order):
        cy = _PAD_V + _ROW_H * row + _ROW_H / 2
        name = feature_cols[j]
        label = name if len(name) <= 26 else name[:23] + "..."
        parts.append(
            f'<text x="{_PAD_L - 8}" y="{cy + 4:.1f}" text-anchor="end">'
            f"{label}</text>"
        )
        vals = X[:, j]
        vspan = vals.max() - vals.min()
        frac = (vals - vals.min()) / vspan if vspan > 0 else np.full(len(vals), 0.5)
        dys = _swarm_offsets(phi[:, j], span)
        for i in range(len(vals)):
            parts.append(
                f'<circle cx="{sx(phi[i, j]):.1f}" cy="{cy + dys[i]:.1f}" '
                f'r="{_R}" fill="{_color(float(frac[i]))}" fill-opacity="0.8"/>'
            )
    # color legend
    lx = _W - _PAD_R + 14
    parts.append(
        f'<text x="{lx}" y="{_PAD_V - 6}" fill="#555" font-size="10" '
        f'transform="rotate(90 {lx} {_PAD_V - 6})">feature value</text>'
    )
    for i in range(24):
        fy = _PAD_V + (height - 2 * _PAD_V) * i / 24
        parts.append(
            f'<rect x="{lx - 10}" y="{fy:.1f}" width="8" '
            f'height="{(height - 2 * _PAD_V) / 24 + 0.5:.1f}" '
            f'fill="{_color(1.0 - i / 23)}"/>'
        )
    parts.append("</svg>")
    return "\n".join(parts)
