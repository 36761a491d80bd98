"""Native C++ runtime helpers: CSV parser parity + trajectory roundtrip."""

import numpy as np
import pytest

from sph_sm_monodomain_tpu import runtime
from sph_sm_monodomain_tpu.utils.io import ASSETS_DIR

needs_native = pytest.mark.skipif(not runtime.native_available(),
                                  reason="native runtime not built")


def _python_parse(path, freq=0, after=3000):
    pts, counter = [], 0
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            ok = len(parts) >= 3
            try:
                xyz = tuple(float(v) for v in parts[:3]) if ok else None
            except ValueError:
                xyz = None
            if xyz is not None and (freq <= 0 or counter < after
                                    or counter % freq == 0):
                pts.append(xyz)
            counter += 1
    return np.asarray(pts, np.float32)


@needs_native
def test_native_csv_matches_python():
    path = ASSETS_DIR / "biceps_simple_out_18475.csv"
    if not path.exists():
        pytest.skip("assets missing")
    for freq in (0, 7):
        a = runtime.parse_cloud_csv(path, subsample_freq=freq)
        b = _python_parse(path, freq=freq)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-6)
    # the reference rule: 5,211 points at freq=7 (SURVEY.md C4)
    assert runtime.parse_cloud_csv(path, subsample_freq=7).shape == (5211, 3)


@needs_native
def test_native_csv_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        runtime.parse_cloud_csv(tmp_path / "nope.csv")


@needs_native
def test_native_csv_capacity_regrow():
    """An undersized capacity must not silently truncate (the Python
    fallback has no cap, so truncation would make physics depend on the
    build environment): the wrapper reparses with the exact row total."""
    path = ASSETS_DIR / "biceps_simple_out_18475.csv"
    if not path.exists():
        pytest.skip("assets missing")
    full = runtime.parse_cloud_csv(path)
    small = runtime.parse_cloud_csv(path, capacity=4)
    assert small.shape == full.shape == (18475, 3)
    np.testing.assert_array_equal(small, full)


def test_trajectory_roundtrip(tmp_path, rng):
    path = tmp_path / "traj.bin"
    n, fields, frames = 64, 4, 5
    payloads = rng.random((frames, n, fields)).astype(np.float32)
    with runtime.TrajectoryWriter(path, n, fields) as w:
        for i in range(frames):
            w.append(i * 10, payloads[i])
    steps, data = runtime.read_trajectory(path)
    np.testing.assert_array_equal(steps, np.arange(frames) * 10)
    np.testing.assert_array_equal(data, payloads)
