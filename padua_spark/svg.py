"""Dependency-free SVG rendering for the computed plot tables.

The reference's ``visualize.py`` draws with matplotlib (absent in this
environment); ``padua_spark.viz`` computes every plot's *data* as a
DataFrame. This module closes the remaining gap — actual figures —
with a small hand-rolled SVG writer: no third-party imports, pure
string generation over the **collected** plot tables (which are small
by construction: per-feature summaries, n×n matrices, linkage arrays).
Deterministic output — same table, same bytes — so figures are
testable like any other artifact.

Covered figures (reference file:line):

- :func:`volcano_svg`      — visualize.py:458-676
- :func:`heatmap_svg`      — correlation matrix, visualize.py:1245-1291
- :func:`bar_svg`          — QC / value-count bars, visualize.py:697-748,1625-1662
- :func:`rank_intensity_svg` — visualize.py:1075-1129
- :func:`dendrogram_svg`   — clustering dendrograms, visualize.py:1733-1869
"""

from __future__ import annotations

import math

__all__ = [
    "volcano_svg",
    "heatmap_svg",
    "bar_svg",
    "rank_intensity_svg",
    "dendrogram_svg",
]

# minimal categorical palette (Okabe-Ito, colorblind-safe)
_BLUE = "#0072B2"
_RED = "#D55E00"
_GREY = "#999999"
_BLACK = "#000000"


def _esc(s) -> str:
    return (
        str(s)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def _fmt(x: float) -> str:
    """Fixed-format coordinates so output is bit-deterministic."""
    return f"{x:.2f}"


def _nice_ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """~n 'nice' tick positions covering [lo, hi] (1/2/5 steps)."""
    if not (hi > lo):
        hi = lo + 1.0
    span = hi - lo
    raw = span / max(1, n)
    mag = 10.0 ** math.floor(math.log10(raw))
    for m in (1.0, 2.0, 5.0, 10.0):
        if raw <= m * mag:
            step = m * mag
            break
    first = math.ceil(lo / step) * step
    ticks = []
    t = first
    while t <= hi + 1e-12 * span:
        ticks.append(0.0 if abs(t) < step * 1e-9 else t)
        t += step
    return ticks


def _tick_label(t: float) -> str:
    return f"{t:g}"


class _Canvas:
    """Tiny SVG canvas with data→pixel scaling and axis drawing."""

    def __init__(
        self,
        width: int,
        height: int,
        xlim: tuple[float, float],
        ylim: tuple[float, float],
        title: str = "",
        xlabel: str = "",
        ylabel: str = "",
        margin: tuple[int, int, int, int] = (40, 20, 50, 60),
    ):
        self.w, self.h = width, height
        self.top, self.right, self.bottom, self.left = margin
        self.xlim, self.ylim = xlim, ylim
        self.parts: list[str] = []
        self.parts.append(
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}" viewBox="0 0 {width} {height}">'
        )
        self.parts.append(
            f'<rect x="0" y="0" width="{width}" height="{height}" '
            'fill="white"/>'
        )
        if title:
            self.text(width / 2, self.top / 2 + 5, title,
                      size=14, anchor="middle", bold=True, raw=True)
        if xlabel:
            self.text(
                self.left + self.plot_w / 2, height - 12, xlabel,
                size=12, anchor="middle", raw=True,
            )
        if ylabel:
            x, y = 16, self.top + self.plot_h / 2
            self.parts.append(
                f'<text x="{_fmt(x)}" y="{_fmt(y)}" font-size="12" '
                f'text-anchor="middle" font-family="sans-serif" '
                f'transform="rotate(-90 {_fmt(x)} {_fmt(y)})">'
                f"{_esc(ylabel)}</text>"
            )

    @property
    def plot_w(self) -> float:
        return self.w - self.left - self.right

    @property
    def plot_h(self) -> float:
        return self.h - self.top - self.bottom

    def sx(self, x: float) -> float:
        lo, hi = self.xlim
        return self.left + (x - lo) / (hi - lo) * self.plot_w

    def sy(self, y: float) -> float:
        lo, hi = self.ylim
        return self.top + self.plot_h - (y - lo) / (hi - lo) * self.plot_h

    def line(self, x1, y1, x2, y2, color=_BLACK, width=1.0, dash=None,
             raw=False):
        if not raw:
            x1, y1 = self.sx(x1), self.sy(y1)
            x2, y2 = self.sx(x2), self.sy(y2)
        d = f' stroke-dasharray="{dash}"' if dash else ""
        self.parts.append(
            f'<line x1="{_fmt(x1)}" y1="{_fmt(y1)}" x2="{_fmt(x2)}" '
            f'y2="{_fmt(y2)}" stroke="{color}" '
            f'stroke-width="{width}"{d}/>'
        )

    def circle(self, x, y, r=3.0, color=_GREY, opacity=0.8):
        self.parts.append(
            f'<circle cx="{_fmt(self.sx(x))}" cy="{_fmt(self.sy(y))}" '
            f'r="{r}" fill="{color}" fill-opacity="{opacity}"/>'
        )

    def rect(self, x, y, w, h, color, raw=False, stroke="none"):
        if not raw:
            x, y = self.sx(x), self.sy(y)
        self.parts.append(
            f'<rect x="{_fmt(x)}" y="{_fmt(y)}" width="{_fmt(w)}" '
            f'height="{_fmt(h)}" fill="{color}" stroke="{stroke}"/>'
        )

    def text(self, x, y, s, size=10, anchor="start", bold=False,
             raw=False, color=_BLACK):
        if not raw:
            x, y = self.sx(x), self.sy(y)
        b = ' font-weight="bold"' if bold else ""
        self.parts.append(
            f'<text x="{_fmt(x)}" y="{_fmt(y)}" font-size="{size}" '
            f'text-anchor="{anchor}" font-family="sans-serif" '
            f'fill="{color}"{b}>{_esc(s)}</text>'
        )

    def axes(self, x_ticks=True, y_ticks=True):
        x0, y0 = self.left, self.top + self.plot_h
        self.line(x0, y0, x0 + self.plot_w, y0, raw=True)
        self.line(x0, self.top, x0, y0, raw=True)
        if x_ticks:
            for t in _nice_ticks(*self.xlim):
                px = self.sx(t)
                self.line(px, y0, px, y0 + 4, raw=True)
                self.text(px, y0 + 16, _tick_label(t),
                          anchor="middle", raw=True)
        if y_ticks:
            for t in _nice_ticks(*self.ylim):
                py = self.sy(t)
                self.line(x0 - 4, py, x0, py, raw=True)
                self.text(x0 - 6, py + 3, _tick_label(t),
                          anchor="end", raw=True)

    def render(self) -> str:
        return "".join(self.parts) + "</svg>"


def _limits(vals, pad=0.05):
    lo, hi = min(vals), max(vals)
    if hi == lo:
        lo, hi = lo - 1.0, hi + 1.0
    span = hi - lo
    return lo - pad * span, hi + pad * span


def volcano_svg(
    rows,
    fc_col: str = "log2_fc",
    p_col: str = "p_value",
    sig_col: str = "significant",
    dir_col: str = "direction",
    width: int = 640,
    height: int = 480,
    title: str = "Volcano",
    min_p: float = 1e-300,
) -> str:
    """Volcano figure from the ``volcano_stats`` table: x = log2 fold
    change, y = −log10 p, significant up/down points colored
    (reference: visualize.py:458-676). ``rows`` is the collected
    result (Rows or dicts)."""
    pts = []
    for r in rows:
        fc, p = r[fc_col], r[p_col]
        if fc is None or p is None:
            continue
        y = -math.log10(max(float(p), min_p))
        sig = bool(r[sig_col]) if r[sig_col] is not None else False
        d = r[dir_col]
        color = (_RED if d == "up" else _BLUE) if sig else _GREY
        pts.append((float(fc), y, color))
    xs = [p[0] for p in pts] or [0.0]
    ys = [p[1] for p in pts] or [0.0]
    c = _Canvas(width, height, _limits(xs), (0.0, max(ys) * 1.05 or 1.0),
                title=title, xlabel="log2 fold change",
                ylabel="-log10 p")
    c.axes()
    if c.xlim[0] < 0 < c.xlim[1]:
        c.line(0.0, c.ylim[0], 0.0, c.ylim[1], color=_GREY, dash="4,3")
    for x, y, color in pts:
        c.circle(x, y, r=3.0, color=color)
    return c.render()


def heatmap_svg(
    rows,
    x_col: str = "sample_x",
    y_col: str = "sample_y",
    v_col: str = "pearson_r",
    vmin: float = -1.0,
    vmax: float = 1.0,
    cell: int = 28,
    title: str = "Correlation",
) -> str:
    """Matrix heatmap (diverging blue↔white↔red) from a long
    (x, y, value) table — the correlation-matrix figure
    (visualize.py:1245-1291). Labels sorted for a deterministic
    layout."""
    xs = sorted({r[x_col] for r in rows})
    ys = sorted({r[y_col] for r in rows})
    left, top = 90, 60
    width = left + cell * len(xs) + 20
    height = top + cell * len(ys) + 20

    def shade(v: float) -> str:
        if vmax <= vmin:  # degenerate limits (constant matrix): midpoint
            return "rgb(255,255,255)"
        t = max(-1.0, min(1.0, (2 * (v - vmin) / (vmax - vmin)) - 1.0))
        if t >= 0:  # white → red
            g = int(round(255 * (1 - t)))
            return f"rgb(255,{g},{g})"
        g = int(round(255 * (1 + t)))  # white → blue
        return f"rgb({g},{g},255)"

    c = _Canvas(width, height, (0, 1), (0, 1), title=title,
                margin=(top, 20, 20, left))
    vals = {(r[x_col], r[y_col]): r[v_col] for r in rows}
    for j, yv in enumerate(ys):
        for i, xv in enumerate(xs):
            v = vals.get((xv, yv))
            color = "#eeeeee" if v is None else shade(float(v))
            c.rect(left + i * cell, top + j * cell, cell - 1, cell - 1,
                   color, raw=True, stroke="white")
    for i, xv in enumerate(xs):
        c.text(left + i * cell + cell / 2, top - 6, xv,
               anchor="middle", raw=True)
    for j, yv in enumerate(ys):
        c.text(left - 6, top + j * cell + cell / 2 + 3, yv,
               anchor="end", raw=True)
    return c.render()


def bar_svg(
    rows,
    label_col: str,
    value_col: str,
    width: int = 520,
    height: int = 360,
    title: str = "",
    color: str = _BLUE,
) -> str:
    """Vertical bar chart from a (label, value) table — QC counts,
    amino-acid frequencies (visualize.py:697-748, 1625-1662). Bar
    order follows the input row order."""
    labels = [r[label_col] for r in rows]
    vals = [float(r[value_col] or 0.0) for r in rows]
    top = max(vals) if vals else 1.0
    c = _Canvas(width, height, (0.0, float(max(1, len(labels)))),
                (0.0, top * 1.05 or 1.0), title=title)
    c.axes(x_ticks=False)
    bw = c.plot_w / max(1, len(labels))
    for i, (lab, v) in enumerate(zip(labels, vals)):
        x = c.left + i * bw
        y = c.sy(v)
        c.rect(x + bw * 0.1, y, bw * 0.8,
               c.top + c.plot_h - y, color, raw=True)
        c.text(x + bw / 2, c.top + c.plot_h + 16, lab,
               anchor="middle", raw=True)
    return c.render()


def rank_intensity_svg(
    rows,
    rank_col: str = "rank",
    value_col: str = "log10_value",
    width: int = 640,
    height: int = 420,
    title: str = "Rank intensity",
) -> str:
    """Rank vs log10-intensity scatter (visualize.py:1075-1129)."""
    pts = [
        (float(r[rank_col]), float(r[value_col]))
        for r in rows
        if r[rank_col] is not None and r[value_col] is not None
    ]
    xs = [p[0] for p in pts] or [0.0]
    ys = [p[1] for p in pts] or [0.0]
    c = _Canvas(width, height, _limits(xs), _limits(ys), title=title,
                xlabel="rank", ylabel="log10 intensity")
    c.axes()
    for x, y in pts:
        c.circle(x, y, r=2.0, color=_BLUE, opacity=0.6)
    return c.render()


def dendrogram_svg(
    linkage,
    labels: list[str],
    width: int = 640,
    height: int = 420,
    title: str = "Ward dendrogram",
) -> str:
    """Dendrogram from a scipy-style (n−1)×4 linkage matrix (the
    output of ``ml.ward_linkage``) — the clustering figure of
    visualize.py:1733-1869. Leaves are laid out in merge-traversal
    order; each merge draws the classic elbow (two risers + one
    bridge) at its linkage height."""
    n = len(labels)
    children: dict[int, tuple[int, int]] = {}
    heights: dict[int, float] = {i: 0.0 for i in range(n)}
    for step, row in enumerate(linkage):
        a, b = int(row[0]), int(row[1])
        children[n + step] = (a, b)
        heights[n + step] = float(row[2])
    root = n + len(linkage) - 1 if len(linkage) else 0

    order: list[int] = []

    def _leaves(node: int):
        stack = [node]
        while stack:
            cur = stack.pop()
            if cur < n:
                order.append(cur)
            else:
                a, b = children[cur]
                stack.append(b)  # pop order: a first
                stack.append(a)

    _leaves(root)
    xpos: dict[int, float] = {}
    for i, leaf in enumerate(order):
        xpos[leaf] = float(i)
    hmax = max(heights.values()) or 1.0
    c = _Canvas(width, height, (-0.5, n - 0.5), (0.0, hmax * 1.05),
                title=title, ylabel="Ward distance")
    c.axes(x_ticks=False)
    # bottom-up: each internal node's x = midpoint of its children
    for node in sorted(children):
        a, b = children[node]
        xa, xb = xpos[a], xpos[b]
        h = heights[node]
        c.line(xa, heights[a], xa, h, color=_BLACK)
        c.line(xb, heights[b], xb, h, color=_BLACK)
        c.line(xa, h, xb, h, color=_BLACK)
        xpos[node] = (xa + xb) / 2.0
    for i, leaf in enumerate(order):
        c.text(c.sx(float(i)), c.top + c.plot_h + 16, labels[leaf],
               anchor="middle", raw=True)
    return c.render()
