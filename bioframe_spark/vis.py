"""Visualization helpers (reference ``src/bioframe/vis.py``, 237 LoC).

Driver-side: collect a (small, pre-filtered) interval frame and draw
matplotlib rectangles with per-chrom facets and greedy level stacking.
Import of matplotlib is deferred (optional dependency pattern).
"""

from __future__ import annotations

import numpy as np


def to_ucsc_colorstring(color) -> str:
    """Matplotlib-compatible color → UCSC 'r,g,b' itemRgb string
    (reference ``vis.py:18-59``)."""
    if isinstance(color, (tuple, list)):
        # RGB(A) tuples need no color library — also keeps this path
        # independent of the matplotlib STUB the reference-loading tests
        # install when the real library is absent (a stubbed to_rgb maps
        # everything to black). Validate what matplotlib would have:
        # 3/4 components, each a number in [0, 1].
        import numbers

        if len(color) not in (3, 4) or not all(
                isinstance(c, numbers.Real) and 0 <= c <= 1 for c in color):
            raise ValueError(f"invalid RGB(A) tuple: {color!r} "
                             "(need 3-4 components in [0, 1])")
        rgb = [float(c) for c in color]  # numbers.Real admits np floats
    else:
        import matplotlib.colors as mcolors

        rgb = mcolors.to_rgb(color)
    return ",".join(str(int(round(c * 255))) for c in rgb[:3])


def stack_intervals_levels(starts, ends) -> np.ndarray:
    """Greedy first-fit interval stacking for plot levels, processed in
    (start, end) order (a valid stacking; the reference kernel's exact
    tie order lives in :func:`..core.arrops.stack_intervals` — both
    share one first-fit loop)."""
    from .core.arrops import first_fit_levels

    starts = np.asarray(starts)
    ends = np.asarray(ends)
    return first_fit_levels(starts, ends, np.lexsort([ends, starts]))


def stack_intervals(starts, ends):
    """Reference-name entry point (arrops.py:773) with the reference
    tie order — see :func:`..core.arrops.stack_intervals`."""
    from .core.arrops import stack_intervals as _si
    return _si(starts, ends)


def plot_intervals_arr(starts, ends, levels=None, labels=None, colors=None,
                       xlim=None, show_coords: bool = False,
                       figsize=(10, 2)):
    """Plot raw interval arrays as stacked rectangles (reference
    ``vis.py:165-237`` surface: per-interval levels/labels/colors,
    auto-stacking when ``levels`` is None)."""
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    starts = np.asarray(starts)
    ends = np.asarray(ends)
    if levels is None:
        levels = stack_intervals_levels(starts, ends)
    levels = np.asarray(levels)
    if colors is None or isinstance(colors, str):
        colors = [colors or "tab:blue"] * len(starts)
    if labels is None or isinstance(labels, str):
        labels = [labels] * len(starts)
    if figsize is not None:
        fig = plt.figure(figsize=figsize)
        ax = fig.add_subplot(111)
    else:
        ax = plt.gca()
        fig = ax.figure
    for s, e, lvl, color, label in zip(starts, ends, levels, colors, labels):
        ax.add_patch(Rectangle((s, lvl), max(e - s, 0.1), 0.8,
                               facecolor=color))
        if label is not None:
            ax.text((s + e) / 2, lvl + 0.4, str(label),
                    ha="center", va="center")
    ax.set_xlim(*(xlim if xlim is not None
                  else (starts.min(), ends.max())))
    ax.set_ylim(-0.5, (levels.max() if len(levels) else 0) + 1.5)
    if not show_coords:
        ax.set_xticks([])
    ax.set_yticks([])
    return fig


def plot_intervals(df, limit: int = 10_000, cols=None, **kwargs):
    """Collect (bounded) and plot interval rectangles, one facet per chrom.

    *df* may be a Spark DataFrame (collected with a safety ``limit``) or a
    pandas DataFrame.
    """
    from .core.specs import _resolve_cols

    ck, sk, ek = _resolve_cols(cols)
    if hasattr(df, "toPandas"):
        pdf = df.select(ck, sk, ek).limit(limit).toPandas()
    else:
        pdf = df
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    chroms = sorted(pdf[ck].dropna().unique())
    fig, axes = plt.subplots(len(chroms), 1, squeeze=False, **kwargs)
    for ax, chrom in zip(axes[:, 0], chroms):
        sub = pdf[pdf[ck] == chrom]
        levels = stack_intervals_levels(sub[sk].values, sub[ek].values)
        for (s, e), lvl in zip(sub[[sk, ek]].values, levels):
            ax.add_patch(Rectangle((s, lvl), max(e - s, 0.1), 0.8))
        ax.set_xlim(pdf[sk].min(), pdf[ek].max())
        ax.set_ylim(-0.5, levels.max() + 1.5 if len(levels) else 1)
        ax.set_ylabel(chrom)
    return fig
