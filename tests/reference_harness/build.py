"""Single source for compiling the reference engine with the headless
test driver (driver.cpp). Used by tests/test_reference_fidelity.py and
tools/compare_reference.py — keep ONE recipe so the suite and the tool
can never compile different reference binaries."""

import subprocess
from pathlib import Path

HARNESS = Path(__file__).resolve().parent
REFERENCE = Path("/root/reference")
BUILD = Path("/tmp/sphsm_ref_harness")


def reference_available() -> bool:
    import shutil
    return (REFERENCE / "SPH_SM_monodomain/SPH_SM_monodomain.cpp").exists() \
        and shutil.which("g++") is not None


def build_reference_driver() -> Path:
    """Compile (read-only sources from /root/reference) and return the
    driver executable path. Reuses the build dir across calls."""
    BUILD.mkdir(exist_ok=True)
    exe = BUILD / "driver"
    srcs = [str(HARNESS / "driver.cpp"),
            str(REFERENCE / "SPH_SM_monodomain/SPH_SM_monodomain.cpp"),
            str(REFERENCE / "Math3D/m3Matrix.cpp"),
            str(REFERENCE / "Math3D/m9Matrix.cpp")]
    cmd = ["g++", "-O2", "-std=c++11",
           f"-I{REFERENCE}/SPH_SM_monodomain", f"-I{REFERENCE}/Math3D",
           "-o", str(exe)] + srcs
    subprocess.run(cmd, check=True, capture_output=True)
    return exe
