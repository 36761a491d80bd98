"""Uniform hash-grid neighbor search, TPU-native.

Replaces the pointer-vector cell grid of the reference (component C5,
/root/reference/SPH_SM_monodomain/SPH_SM_monodomain.cpp:127-213) with a
sort-based, fixed-capacity bucket table so every shape is static under jit:

  1. `cell_hash`   — same linear hash x + Gx*(y + Gy*z), -1 out of grid
                     (cpp:136-146); cell coords use C-style truncation-toward-
                     zero like `(int)` casts at cpp:127-134.
  2. `build_buckets` — stable argsort of cell ids, rank-within-cell via
                     searchsorted, scatter into a (num_cells, capacity) index
                     table. Particles beyond `capacity` in one cell are dropped
                     and counted (`overflow`) so the caller can resize.
  3. `gather_candidates` — for each particle, the 27-cell stencil
                     (cpp:462-481 loop order) becomes a (N, 27*capacity)
                     gather of candidate particle indices + a validity mask.

Downstream SPH phases consume (idx, mask) and compute masked pair
contributions — the TPU analog of the reference's per-cell pointer chasing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig


class NeighborTable(NamedTuple):
    """Compacted neighbor list per particle.

    idx:  (N, K) int32 — neighbor particle index (0 where invalid).
    mask: (N, K) bool  — entry validity.
    overflow: ()  int32 — cell-capacity drops + neighbor-capacity drops
                          (any nonzero value means the tables must be
                          rebuilt with larger static capacities).
    """
    idx: jax.Array
    mask: jax.Array
    overflow: jax.Array


def cell_coords(pos: jax.Array, cfg: SimConfig) -> jax.Array:
    """Integer cell coordinates, truncation toward zero (cpp:127-134)."""
    return (pos / cfg.cell_size).astype(jnp.int32)


def cell_hash(coords: jax.Array, cfg: SimConfig) -> jax.Array:
    """Linear hash with -1 for out-of-grid coords (cpp:136-146)."""
    gx, gy, gz = cfg.grid_size
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    inside = ((x >= 0) & (x < gx) & (y >= 0) & (y < gy) & (z >= 0) & (z < gz))
    h = x + gx * (y + gy * z)
    return jnp.where(inside, h, -1)


# (dy, dz) offsets of the 9 x-contiguous stencil runs, z-major like the
# reference loop order (cpp:462-464).
_RUN_OFFSETS = np.array([(dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)],
                        dtype=np.int32)


def build_neighbor_table(pos_q: jax.Array, pos_g: jax.Array,
                         active_g: jax.Array, cfg: SimConfig,
                         cell_capacity: int, neighbor_capacity: int
                         ) -> NeighborTable:
    """Sorted-window neighbor table (scatter-free, TPU-native).

    Find_neighbors + the 27-cell stencil (cpp:199-213, 462-481), restructured
    around a spatial sort: with the linear hash x + Gx*(y + Gy*z)
    (cpp:142), the three x-neighbor cells at a fixed (y, z) are CONTIGUOUS
    in cell-sorted particle order, so each query's stencil is exactly 9
    contiguous runs of the sorted array. Each run becomes a fixed-width
    window `start + iota(W)` masked by the true run length — no scatter, no
    per-row compaction, and candidates arrive sorted (gather locality).

    `neighbor_capacity` is the TOTAL table width K; the per-run window is
    W = K // 9 (use ops.grid.auto_window_capacity to size it). Runs longer
    than W are truncated and counted in `overflow`.

    Returned indices are GLOBAL particle ids (original order), so the table
    is a drop-in for the SPH phases; `pos_q` may be a shard of `pos_g`.
    """
    w = neighbor_capacity // 9
    if w * 9 != neighbor_capacity:
        raise ValueError("neighbor_capacity must be a multiple of 9 for the "
                         "window table")
    n_g = pos_g.shape[0]
    n_q = pos_q.shape[0]
    gx, gy, gz = cfg.grid_size

    ids0 = cell_hash(cell_coords(pos_g, cfg), cfg)
    ids = jnp.where((ids0 >= 0) & active_g, ids0, cfg.num_cells)
    order = jnp.argsort(ids, stable=True).astype(jnp.int32)
    sorted_ids = ids[order]

    c = cell_coords(pos_q, cfg)
    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
    off = jnp.asarray(_RUN_OFFSETS)
    y = cy[:, None] + off[None, :, 0]                    # (Nq, 9)
    z = cz[:, None] + off[None, :, 1]
    # a query whose own cell is out of grid contributes no runs (hash -1
    # behavior, cpp:138-140)
    q_ok = (cx >= 0) & (cx < gx) & (cy >= 0) & (cy < gy) \
        & (cz >= 0) & (cz < gz)
    run_ok = q_ok[:, None] & (y >= 0) & (y < gy) & (z >= 0) & (z < gz)
    xlo = jnp.maximum(cx - 1, 0)
    xhi = jnp.minimum(cx + 1, gx - 1)
    lo_hash = xlo[:, None] + gx * (y + gy * z)
    hi_hash = xhi[:, None] + gx * (y + gy * z) + 1
    start = jnp.searchsorted(sorted_ids,
                             jnp.where(run_ok, lo_hash, 0)).astype(jnp.int32)
    end = jnp.searchsorted(sorted_ids,
                           jnp.where(run_ok, hi_hash, 0)).astype(jnp.int32)
    end = jnp.where(run_ok, end, start)
    length = end - start

    wi = jax.lax.broadcasted_iota(jnp.int32, (n_q, 9, w), 2)
    sidx = jnp.minimum(start[:, :, None] + wi, n_g - 1)
    mask = wi < length[:, :, None]
    idx = jnp.where(mask, order[sidx], 0)
    overflow = jnp.sum(jnp.maximum(length - w, 0)).astype(jnp.int32)
    return NeighborTable(idx=idx.reshape(n_q, 9 * w),
                         mask=mask.reshape(n_q, 9 * w),
                         overflow=overflow)


def _occupancy(positions: np.ndarray, cfg: SimConfig):
    """Shared host-side occupancy preamble for the auto_*_capacity sizers:
    in-grid cell coords `c` and the full occupancy histogram (num_cells,)
    — one implementation so the truncation/hash semantics cannot drift
    between the three sizers."""
    gx, gy, gz = cfg.grid_size
    coords = (np.asarray(positions) / cfg.cell_size).astype(np.int64)
    inside = ((coords >= 0).all(1)
              & (coords[:, 0] < gx) & (coords[:, 1] < gy) & (coords[:, 2] < gz))
    c = coords[inside]
    occ = np.bincount(c[:, 0] + gx * (c[:, 1] + gy * c[:, 2]),
                      minlength=cfg.num_cells)
    return c, occ


def auto_cell_capacity(positions: np.ndarray, cfg: SimConfig,
                       headroom: float = 2.0, minimum: int = 8) -> int:
    """Pick a static bucket capacity from the initial occupancy histogram.

    Host-side (runs once at scene build). Returns max initial cell occupancy
    times `headroom`, rounded up to a multiple of 4.
    """
    _, occ = _occupancy(positions, cfg)
    cap = int(np.ceil(occ.max() * headroom)) if occ.size else minimum
    cap = max(cap, minimum)
    return ((cap + 3) // 4) * 4


def auto_neighbor_capacity(positions: np.ndarray, cfg: SimConfig,
                           headroom: float = 1.5, minimum: int = 32) -> int:
    """Pick a static compacted-neighbor capacity from the initial cloud.

    Host-side. Upper-bounds the per-particle neighbor count by the summed
    occupancy of each particle's 27-cell stencil (the distance filter can
    only shrink it), times `headroom` for motion, rounded up to a multiple
    of 8.
    """
    gx, gy, gz = cfg.grid_size
    c, occ = _occupancy(positions, cfg)
    occ = occ.reshape(gz, gy, gx)
    padded = np.zeros((gz + 2, gy + 2, gx + 2), np.int64)
    padded[1:-1, 1:-1, 1:-1] = occ
    stencil = sum(padded[1 + dz:gz + 1 + dz, 1 + dy:gy + 1 + dy,
                         1 + dx:gx + 1 + dx]
                  for dz in (-1, 0, 1) for dy in (-1, 0, 1)
                  for dx in (-1, 0, 1))
    per_particle = stencil[c[:, 2], c[:, 1], c[:, 0]]
    cap = int(np.ceil(per_particle.max() * headroom)) if per_particle.size \
        else minimum
    cap = max(cap, minimum)
    return ((cap + 7) // 8) * 8


def auto_window_capacity(positions: np.ndarray, cfg: SimConfig,
                         headroom: float = 1.8, minimum: int = 16) -> int:
    """Size the sorted-window table: per-run width W = headroom * the max
    occupancy of any 3 consecutive x-cells at init. Returns the TOTAL table
    width K = 9 * W (what build_neighbor_table expects as
    neighbor_capacity). Host-side, runs once at scene build."""
    gx, gy, gz = cfg.grid_size
    _, occ = _occupancy(positions, cfg)
    occ = occ.reshape(gz, gy, gx)
    padded = np.zeros((gz, gy, gx + 2), np.int64)
    padded[:, :, 1:-1] = occ
    run3 = padded[:, :, :-2] + padded[:, :, 1:-1] + padded[:, :, 2:]
    w = int(np.ceil(run3.max() * headroom)) if run3.size else minimum
    w = max(w, minimum)
    w = ((w + 7) // 8) * 8
    return 9 * w
