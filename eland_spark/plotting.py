"""Plotting surface (reference eland/plotting/_core.py:21-131,
eland/plotting/_matplotlib/hist.py:42-156).

The reference's contract: the HISTOGRAM IS COMPUTED SERVER-SIDE (two
aggregation requests) and only the per-bin counts reach matplotlib.
Same split here — `operators.histogram` runs the two Spark jobs and
ships back ``bins+1`` edges and ``bins`` counts; rendering is
import-gated on matplotlib (not installed in this environment), and
``hist_data`` exposes the exact frame a renderer would consume.
"""

from __future__ import annotations

import pandas as pd

from .frame import DataFrame
from .operators.histogram import hist_matrix, histogram

__all__ = ["hist_data", "hist_plot"]


def hist_data(df: DataFrame, bins: int = 10) -> pd.DataFrame:
    """Per-numeric-column (edges, weights) frame — the reference's
    ``_hist`` payload (eland/plotting/_core.py:81-131): bin left edges
    and counts, computed cluster-side in two jobs total (hist_matrix)."""
    out = {}
    for name, (edges, counts) in hist_matrix(df, bins).items():
        out[f"{name}__edges"] = edges[:-1]
        out[f"{name}__weights"] = counts
    return pd.DataFrame(out)


def hist_plot(df: DataFrame, column: str, bins: int = 10, ax=None):
    """Render one column's histogram with matplotlib (weights trick —
    pre-counted bins, exactly like the reference's hist renderer)."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover — matplotlib absent here
        raise ImportError(
            "matplotlib is required for rendering; use hist_data() for "
            "the computed bins"
        ) from e
    edges, counts = histogram(df, column, bins)
    if ax is None:  # pragma: no cover
        _, ax = plt.subplots()
    ax.hist(edges[:-1], bins=edges, weights=counts)  # pragma: no cover
    ax.set_xlabel(column)  # pragma: no cover
    return ax  # pragma: no cover
