"""Neighbor-table tests vs O(N^2) brute force (SURVEY.md §4, C5)."""

import numpy as np
import jax.numpy as jnp

from sph_sm_monodomain_tpu.config import SimConfig
from sph_sm_monodomain_tpu.ops import grid

CFG = SimConfig()


def _random_cloud(rng, n, lo=0.2, hi=0.7):
    return (rng.random((n, 3)) * (hi - lo) + lo).astype(np.float32)


def _brute_stencil_pairs(pos):
    # the window table yields exactly the reference's 27-cell stencil set
    cell = (pos / CFG.cell_size).astype(np.int64)
    d = np.abs(cell[:, None, :] - cell[None, :, :])
    return (d <= 1).all(-1)


def test_candidates_match_brute_force_stencil(rng):
    pos = _random_cloud(rng, 300)
    active = np.ones(300, bool)
    nbr = grid.build_neighbor_table(jnp.asarray(pos), jnp.asarray(pos),
                                    jnp.asarray(active),
                                    CFG, cell_capacity=64,
                                    neighbor_capacity=9 * 64)
    assert int(nbr.overflow) == 0
    want = _brute_stencil_pairs(pos)
    got = np.zeros_like(want)
    idx, mask = np.asarray(nbr.idx), np.asarray(nbr.mask)
    for i in range(pos.shape[0]):
        got[i, idx[i][mask[i]]] = True
    np.testing.assert_array_equal(got, want)


def test_candidates_cover_kernel_support(rng):
    # every pair within h must be a candidate (h == cell size)
    pos = _random_cloud(rng, 400)
    nbr = grid.build_neighbor_table(jnp.asarray(pos), jnp.asarray(pos),
                                    jnp.ones(400, bool),
                                    CFG, cell_capacity=64,
                                    neighbor_capacity=9 * 64)
    idx, mask = np.asarray(nbr.idx), np.asarray(nbr.mask)
    d2 = ((pos[:, None] - pos[None, :]) ** 2).sum(-1)
    within = d2 <= CFG.kernel_h ** 2
    for i in range(pos.shape[0]):
        cands = set(idx[i][mask[i]])
        for j in np.nonzero(within[i])[0]:
            assert j in cands, f"pair ({i},{j}) within h missed"


def test_each_particle_is_own_candidate_once(rng):
    pos = _random_cloud(rng, 200)
    nbr = grid.build_neighbor_table(jnp.asarray(pos), jnp.asarray(pos),
                                    jnp.ones(200, bool),
                                    CFG, cell_capacity=32,
                                    neighbor_capacity=9 * 32)
    idx, mask = np.asarray(nbr.idx), np.asarray(nbr.mask)
    for i in range(200):
        assert (idx[i][mask[i]] == i).sum() == 1


def test_inactive_and_out_of_grid_excluded(rng):
    pos = _random_cloud(rng, 64)
    pos[10] = (9.0, 9.0, 9.0)        # out of grid -> hash -1 (cpp:138-140)
    active = np.ones(64, bool)
    active[20] = False               # padded lane
    nbr = grid.build_neighbor_table(jnp.asarray(pos), jnp.asarray(pos),
                                    jnp.asarray(active),
                                    CFG, cell_capacity=64,
                                    neighbor_capacity=9 * 64)
    idx, mask = np.asarray(nbr.idx), np.asarray(nbr.mask)
    flat = idx[mask]
    assert 10 not in flat and 20 not in flat


def test_overflow_counted(rng):
    # 20 coincident particles, per-run window W=8 -> every query truncates
    # its (single) 20-long run by 12 entries
    pos = np.full((20, 3), 0.5, np.float32)
    nbr = grid.build_neighbor_table(jnp.asarray(pos), jnp.asarray(pos),
                                    jnp.ones(20, bool),
                                    CFG, cell_capacity=8,
                                    neighbor_capacity=9 * 8)
    assert int(nbr.overflow) == 12 * 20
    # kept candidates are the FIRST 8 by particle index (stable sort)
    idx, mask = np.asarray(nbr.idx), np.asarray(nbr.mask)
    assert set(idx[0][mask[0]]) == set(range(8))


def test_overflow_counted_bucketed(rng):
    # legacy bucketed path: cell capacity 8 -> 12 particles dropped
    pos = np.full((20, 3), 0.5, np.float32)
    from sph_sm_monodomain_tpu.ablation.bucketed_grid import (
        build_neighbor_table_bucketed)
    nbr = build_neighbor_table_bucketed(
        jnp.asarray(pos), jnp.asarray(pos), jnp.ones(20, bool), CFG,
        cell_capacity=8, neighbor_capacity=64)
    assert int(nbr.overflow) == 12
    idx, mask = np.asarray(nbr.idx), np.asarray(nbr.mask)
    assert set(idx[0][mask[0]]) == set(range(8))


def test_auto_capacity(rng):
    pos = _random_cloud(rng, 500)
    cap = grid.auto_cell_capacity(pos, CFG)
    occ_max = 0
    cell = (pos / CFG.cell_size).astype(np.int64)
    _, counts = np.unique(cell, axis=0, return_counts=True)
    occ_max = counts.max()
    assert cap >= 2 * occ_max - 4 and cap % 4 == 0
