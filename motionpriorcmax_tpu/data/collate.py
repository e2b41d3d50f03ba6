"""Fixed-capacity batching of ragged event streams.

The reference collate pads each batch to its max event count
(src/loader/dsec/loader.py:360-415, src/modules/data_loading.py:14-84) —
dynamic shapes that would force an XLA recompile per batch.  Here capacities
are *static*: events are padded (or tail-truncated) to a bucketed capacity,
with the 6th 'valid' column marking real rows — semantically identical to the
reference's padding mask column (pad_events appends the same flag,
loader.py:360-364).

Polarity-aware batching packs positives first with a static positive capacity
(the reference shares one NUM_POS_EVENTS scalar per batch, data_loading.py:22-47).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def round_up_capacity(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (last bucket caps: overflow is tail-truncated)."""
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def pad_events(events: np.ndarray, capacity: int) -> np.ndarray:
    """[n, 5] (y, x, t, p, bin) -> [capacity, 6] with the valid column.

    Reference: pad_events (src/loader/dsec/loader.py:360-364).  Overflow
    beyond capacity is dropped from the tail (reference MultiFlow analog:
    cap_num_events, src/loader/multiflow/datasubset.py:62-68).
    """
    n = min(len(events), capacity)
    out = np.zeros((capacity, 6), dtype=np.float32)
    out[:n, :5] = events[:n, :5]
    out[:n, 5] = 1.0
    return out


def collate_fixed_capacity(
    samples: List[Dict[str, np.ndarray]],
    capacity: int,
    polarity_aware: bool = False,
    pos_capacity: Optional[int] = None,
    capacity_buckets: Optional[Sequence[int]] = None,
    lut_cell_sort_params: Optional[tuple] = None,
) -> Dict[str, np.ndarray]:
    """Stack samples into a static-shaped batch dict.

    Args:
      samples: list of dicts with 'events' [n,5] (or 'pos_events'/'neg_events'
        when polarity_aware), 'voxel' optional [C,H,W], optional
        'forward_flow' [2,H,W] + 'flow_valid' [H,W], 'timestamp', 'file_index'.
      capacity: static per-sample event capacity (total when polarity_aware).
      pos_capacity: static positive-event capacity (defaults to capacity // 2).
      capacity_buckets: optional ascending capacities.  When set, the batch is
        padded to the smallest bucket covering its max per-sample event count
        (per polarity when polarity_aware, each from `b // 2` sub-buckets)
        instead of always paying `capacity`.  Shapes stay static *per bucket*,
        so jit compiles at most len(buckets) variants; sparse windows stop
        paying full-capacity padding (and full-capacity warp/IWE compute).
      lut_cell_sort_params: optional (image_shape, num_bins, superpixel).
        When set, events are sorted by flow-LUT cell (per polarity segment)
        and the batch carries 'lut_cell_ends' [B, S * num_cells] — the
        focus-loss gather backward then runs the O(M) sorted segment sum
        on device (host_ops.lut_cell_sort).

    Returns:
      batch dict of stacked numpy arrays; 'num_pos_events' is a python int
      (static — feeds the jit-static argument of the train step).
    """
    batch: Dict[str, np.ndarray] = {}
    if "events" not in samples[0] and "pos_events" not in samples[0]:
        # Event-free samples (e.g. supervised MultiFlow training needs only
        # voxels + GT flow): skip the event packing entirely.
        ev = None
    elif polarity_aware:
        if capacity_buckets is not None:
            half = [b // 2 for b in capacity_buckets]
            pos_capacity = round_up_capacity(
                max(len(s["pos_events"]) for s in samples), half)
            neg_capacity = round_up_capacity(
                max(len(s["neg_events"]) for s in samples), half)
        elif pos_capacity is None:
            pos_capacity = capacity // 2
            neg_capacity = capacity - pos_capacity
        else:
            neg_capacity = capacity - pos_capacity
        ev = [
            np.concatenate([
                pad_events(s["pos_events"], pos_capacity),
                pad_events(s["neg_events"], neg_capacity),
            ], axis=0)
            for s in samples
        ]
        batch["num_pos_events"] = pos_capacity
    else:
        if capacity_buckets is not None:
            capacity = round_up_capacity(
                max(len(s["events"]) for s in samples), capacity_buckets)
        ev = [pad_events(s["events"], capacity) for s in samples]
    if ev is not None:
        if lut_cell_sort_params is not None:
            from .host_ops import lut_cell_sort

            image_shape, num_bins, superpixel = lut_cell_sort_params
            npos = batch.get("num_pos_events", -1) if polarity_aware else -1
            pairs = [lut_cell_sort(e, image_shape, num_bins, superpixel,
                                   num_pos_events=npos) for e in ev]
            ev = [p[0] for p in pairs]
            batch["lut_cell_ends"] = np.stack([p[1] for p in pairs], axis=0)
        batch["events"] = np.stack(ev, axis=0)

    for key in ("voxel", "forward_flow", "flow_valid", "timestamp",
                "file_index", "ev_repr", "flow", "flow_timestamps", "id_mask"):
        if key in samples[0]:
            batch[key] = np.stack([np.asarray(s[key]) for s in samples], axis=0)
    if "name" in samples[0]:
        batch["name"] = [s["name"] for s in samples]
    return batch
