"""Flat (scan, view, slice) index map with empty-slice filtering — vectorized.

Reference semantics (``utils/mri_dataset.py:37-51``): iterate scans → views →
slices in order and keep a slice iff ``max(mask_slice) > 0`` when
``filter=True`` (training), everything when ``filter=False`` (eval). The
reference does this with a triple Python loop over freshly-loaded volumes;
here it is three vectorized reductions over the stacked label array.
"""

from __future__ import annotations

import numpy as np

# view axes: view v slices along axis v of the (padded) volume —
# mri_dataset.py:70-82 ([1,0,0]→axis0, [0,1,0]→axis1, [0,0,1]→axis2)
VIEW_AXES = (0, 1, 2)
NUM_VIEWS = 3


def nonempty_table(labels: np.ndarray) -> np.ndarray:
    """(N, 3, S) bool: does (scan, view, slice) contain any foreground?"""
    n, s = labels.shape[0], labels.shape[1]
    table = np.empty((n, NUM_VIEWS, s), dtype=bool)
    table[:, 0] = labels.max(axis=(2, 3)) > 0
    table[:, 1] = labels.max(axis=(1, 3)) > 0
    table[:, 2] = labels.max(axis=(1, 2)) > 0
    return table


def build_index_map_from_table(table: np.ndarray, filter: bool = True) -> np.ndarray:
    """(N,V,S) nonempty table → (M,3) (scan, view, slice) triples in
    reference order; used for both standard and oblique view sets."""
    n, v, s = table.shape
    scans, views, slices = np.meshgrid(
        np.arange(n), np.arange(v), np.arange(s), indexing="ij"
    )
    triples = np.stack([scans.ravel(), views.ravel(), slices.ravel()], axis=1).astype(np.int32)
    if filter:
        triples = triples[table.ravel()]
    return triples


def build_index_map(labels: np.ndarray, filter: bool = True) -> np.ndarray:
    """(M, 3) int32 array of (scan, view, slice) triples in reference order
    (scan-major, then view, then slice — ``mri_dataset.py:37-49``)."""
    if not filter:
        # unfiltered: only the shape matters, skip the label reduction
        shape = (labels.shape[0], NUM_VIEWS, labels.shape[1])
        return build_index_map_from_table(np.empty(shape, dtype=bool), filter=False)
    return build_index_map_from_table(nonempty_table(labels), filter=True)
