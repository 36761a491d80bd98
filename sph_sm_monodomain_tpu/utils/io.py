"""Point-cloud loading and scene construction.

Replaces the app-level loader + scene setup of the reference (component C4,
/root/reference/main.cpp:145-179, 464-496). Data assets (MIT-licensed CSV
point clouds from the reference's Resources/) live under assets/ at the repo
root.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import NamedTuple

import numpy as np

from ..config import SimConfig
from ..state import ParticleState, init_fluid
from ..ops.grid import auto_cell_capacity, auto_window_capacity
from ..ops.pallas_sweeps import auto_sweep4_params, auto_sweep5_params
from ..ops import electrophysiology as ep

_REPO_ROOT = Path(__file__).resolve().parents[2]
ASSETS_DIR = Path(os.environ.get("SPH_SM_ASSETS", _REPO_ROOT / "assets"))


def read_cloud_csv(path, subsample_freq: int = 0,
                   subsample_after: int = 3000) -> np.ndarray:
    """Read an x,y,z CSV cloud (readCloudFromFile, main.cpp:145-179).

    When `subsample_freq` > 0 the reference's muscle-data rule applies: keep
    the first `subsample_after` rows, then every `subsample_freq`-th row (by
    row counter) — main.cpp:165-176. The reference enables this only for the
    18,475-point biceps file; callers pass subsample_freq=7 for it
    (main.cpp:482), yielding 5,211 points.
    """
    from ..runtime import parse_cloud_csv
    native = parse_cloud_csv(path, subsample_freq, subsample_after)
    if native is not None:
        return native
    pts = []
    counter = 0
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 3:
                counter += 1
                continue
            try:
                xyz = (float(parts[0]), float(parts[1]), float(parts[2]))
            except ValueError:
                counter += 1
                continue
            if subsample_freq <= 0:
                pts.append(xyz)
            else:
                if counter < subsample_after or counter % subsample_freq == 0:
                    pts.append(xyz)
            counter += 1
    return np.asarray(pts, dtype=np.float32)


def cube_positions(cfg: SimConfig) -> np.ndarray:
    """Procedural cube seeding (init_cube, main.cpp:464-477): grid with
    spacing 0.9*h over [0.3W, 0.7W) x [0, 0.4W) x [0.3W, 0.7W), float32
    accumulation like the C++ loop."""
    w = np.float32(cfg.world_size[0])
    step = np.float32(cfg.kernel_h) * np.float32(0.9)
    pts = []
    k = w * np.float32(0.3)
    while k < w * np.float32(0.7):
        j = w * np.float32(0.0)
        while j < w * np.float32(0.4):
            i = w * np.float32(0.3)
            while i < w * np.float32(0.7):
                pts.append((i, j, k))
                i += step
            j += step
        k += step
    return np.asarray(pts, dtype=np.float32)


def rescale_into_world(points: np.ndarray, cfg: SimConfig,
                       margin: float = 0.15) -> np.ndarray:
    """Fit an out-of-bounds cloud into the world box (needed for susane.csv
    and RectusFemoris, which the reference ships out of bounds — SURVEY.md D1)."""
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    span = np.maximum(hi - lo, 1e-6)
    world = np.asarray(cfg.world_size, dtype=np.float32)
    usable = world * (1.0 - 2.0 * margin)
    scale = float((usable / span).min())
    return ((points - lo) * scale + world * margin).astype(np.float32)


class Scene(NamedTuple):
    state: ParticleState
    cfg: SimConfig
    cell_capacity: int       # hash-grid bucket width (static)
    neighbor_capacity: int   # window neighbor-table width K = 9*W (static)
    num_particles: int
    name: str
    q_block: int = 128       # fused-sweep query block size (static)
    block_window: int = 128  # fused-sweep candidate chunk width (static)
    sub_block: int = 128     # window-bound granularity (fused sub_q)
    fused_impl: str = "v4"   # production fused-step kernel generation
    pack_cap: int = 0        # v5 packed-slab capacity kb (static)


_SCENE_FILES = {
    "biceps_18475": ("biceps_simple_out_18475.csv", 7),
    "biceps_full": ("biceps_simple_out_18475.csv", 0),
    "biceps_4944": ("biceps_simple_out_4944.csv", 0),
    "biceps_1": ("biceps_simple_out_1.csv", 0),
    "biceps_2": ("biceps_simple_out_2.csv", 0),
    "biceps": ("biceps_simple_out.csv", 0),
    "biceps_scaled_1": ("biceps_simple_out_scaled_1.csv", 0),
    "susane": ("susane.csv", 0),
    "rectus_femoris": ("RectusFemoris/rectusFemorisVertices.csv", 0),
}


def scene_positions(name: str, cfg: SimConfig,
                    replicate: int = 1) -> np.ndarray:
    """Raw (pre-state) positions for a named scene.

    `replicate` > 1 tiles the cloud side by side along x at ORIGINAL density
    — the 'multi-muscle' scale-up config from BASELINE.json. The caller must
    expand cfg.world_size x-extent by the same factor (build_scene does);
    compressing tiles into the original world instead multiplies the SPH
    density by the tile count and blows the pressure up.
    """
    # procedural / rescaled scenes must be built against ONE TILE's world
    # (cfg arrives with the x-extent already expanded by `replicate`);
    # seeding against the expanded box would push the cube past the y/z
    # walls (out-of-grid particles then slam into the AABB clamp)
    tile_cfg = cfg if replicate == 1 else cfg.replace(
        world_size=(cfg.world_size[0] / replicate,
                    cfg.world_size[1], cfg.world_size[2]))
    if name == "cube":
        pts = cube_positions(tile_cfg)
    elif name in _SCENE_FILES:
        fname, freq = _SCENE_FILES[name]
        pts = read_cloud_csv(ASSETS_DIR / fname, subsample_freq=freq)
        if name in ("susane", "rectus_femoris"):
            pts = rescale_into_world(pts, tile_cfg)
    else:
        raise ValueError(f"unknown scene {name!r}; have "
                         f"{sorted(_SCENE_FILES) + ['cube']}")
    if replicate > 1:
        # cfg arrives with the ALREADY-expanded world; one tile is 1/replicate
        tile_w = np.float32(cfg.world_size[0] / replicate)
        tiles = []
        for r in range(replicate):
            t = pts.copy()
            t[:, 0] = t[:, 0] + tile_w * r
            tiles.append(t)
        pts = np.concatenate(tiles, axis=0)
    return pts


def smem_budget_sub_q(padded_cap: int) -> int:
    """Smallest power-of-two sub-block granularity >=128 whose v4 window
    bounds fit the scalar-memory prefetch budget.

    The v4 kernels SMEM-prefetch 4 window bounds x 8 B per sub-block
    (fused_step._call_kernel3 rejects > 900 kB); past ~3.6M padded rows
    the 128-row granularity overflows, so sub-blocks (and q_block with
    them) double until the bounds fit."""
    sub_q = 128
    while (padded_cap // sub_q) * 4 * 8 > 900_000:
        sub_q *= 2
    return sub_q


def build_scene(name: str, cfg: SimConfig | None = None, replicate: int = 1,
                stim: bool = True, pad_to: int | None = None,
                fused_impl: str | None = None) -> Scene:
    """Load + seed + stimulate a scene the way the reference app does
    (init / init_mesh / init_cube, main.cpp:464-496).

    `fused_impl` overrides the production fused-step kernel generation
    (None -> the measured-fastest default for the scene)."""
    cfg = cfg or SimConfig()
    tile_w = cfg.world_size[0]
    if replicate > 1:
        # expand the world along x so tiles keep the original density, and
        # give every muscle its OWN shape-matching cluster: one global
        # affine fit over a long disconnected tile array is wrong physics
        # (muscles couple mechanically through SM) and fp32-hostile (the
        # x moments dwarf y/z; at 56 tiles the summation noise in the small
        # cross moments corrupts the rotation fit and particles fly)
        cfg = cfg.replace(world_size=(cfg.world_size[0] * replicate,
                                      cfg.world_size[1], cfg.world_size[2]),
                          sm_clusters=replicate)
    pts = scene_positions(name, cfg, replicate)
    if replicate > 1:
        # tiles are built contiguously (tile k owns rows [k*R, (k+1)*R)),
        # so single-chip paths can use the reshape segment-reduction form
        cfg = cfg.replace(sm_tile_rows=pts.shape[0] // replicate)
    if pts.shape[0] > cfg.max_particles:
        cfg = cfg.replace(max_particles=int(pts.shape[0]))
    smem_sub_q = 128
    if (fused_impl or "v4") not in ("v5", "v5s"):
        smem_sub_q = smem_budget_sub_q(pad_to
                                       or -(-pts.shape[0] // 128) * 128)
        if smem_sub_q > 128:
            # the capacity must pad to a q_block multiple for the kernel
            # grid to tile evenly
            pad_to = -(-(pad_to or pts.shape[0]) // smem_sub_q) * smem_sub_q
    state = init_fluid(pts, cfg, pad_to=pad_to)
    if stim:
        if name == "cube":
            state = ep.turn_on_stim_cube(state, pts, cfg,   # main.cpp:476
                                         tile_width=(tile_w if replicate > 1
                                                     else None))
        else:
            state = ep.turn_on_stim_mesh(state, pts, cfg,   # main.cpp:487
                                         tile_width=(tile_w if replicate > 1
                                                     else None))
    cap = cfg.cell_capacity or auto_cell_capacity(pts, cfg)
    k_nbr = auto_window_capacity(pts, cfg)
    impl = fused_impl or "v4"
    if impl in ("v5", "v5s"):
        # packed-slab tuning: block granularity + slab capacity from the
        # initial cloud's dilated-union histogram (pallas_sweeps.py)
        sub_q, pack_cap, w_chunk = auto_sweep5_params(pts, cfg)
    else:
        # v4 fused-sweep tuning, measured on v5e (DEVELOPMENT.md):
        # sub_q=128 window granularity with 128-wide candidate chunks is
        # the optimum for the biceps-density clouds; the auto-tuner only
        # widens chunks for much denser scenes (and sub-blocks for the
        # multi-million-particle SMEM bounds budget, smem_sub_q above)
        sub_q, w_chunk = auto_sweep4_params(pts, cfg, sub_q=smem_sub_q)
        pack_cap = 0
    return Scene(state=state, cfg=cfg, cell_capacity=cap,
                 neighbor_capacity=k_nbr,
                 num_particles=int(pts.shape[0]), name=name,
                 q_block=max(128, sub_q), block_window=w_chunk,
                 sub_block=sub_q, fused_impl=impl, pack_cap=pack_cap)


def load_surface_mesh(which: str = "biceps"):
    """Load the triangle surface mesh shipped with the reference (D1 assets;
    loaded by init_mesh at main.cpp:483-485 for the commented-out triangle
    renderer, main.cpp:232-266).

    Returns (faces (F,3) int32 0-based particle indices, normals (M,3),
    normal_idx (F,3) int32 0-based). Faces index the FIRST `max_index`
    particles of the matching cloud (the reference indexes Particles[]
    directly with the 1-based face indices).
    """
    if which == "biceps":
        faces = read_cloud_csv(ASSETS_DIR / "faces.csv")
        normals = read_cloud_csv(ASSETS_DIR / "normals.txt")
        nidx = read_cloud_csv(ASSETS_DIR / "normals_index.csv")
    elif which == "rectus_femoris":
        base = ASSETS_DIR / "RectusFemoris"
        faces = read_cloud_csv(base / "rectusFemorisFaces.csv")
        normals = read_cloud_csv(base / "rectusFemorisNormals.csv")
        nidx = read_cloud_csv(base / "rectusFemorisNormalIndex.csv")
    else:
        raise ValueError(f"no surface mesh for {which!r}")
    return (faces.astype(np.int32) - 1, normals.astype(np.float32),
            nidx.astype(np.int32) - 1)
