"""sph_sm_monodomain_tpu — TPU-native coupled SPH + shape-matching +
monodomain skeletal-muscle simulation framework.

A ground-up JAX/XLA re-architecture of the capabilities of the reference C++
application Hagen23/SPH-SM-Monodomain (see SURVEY.md): immutable SoA particle
state, one jitted step composed of pure phase transforms, sort-based static-
shape neighbor search, and `shard_map` particle sharding for multi-chip runs.
"""

from .config import SimConfig, DEFAULT_CONFIG, PARAM_FIELDS, resolve_params
from .state import (ParticleState, init_fluid, save_checkpoint,
                    load_checkpoint)
from .models.monodomain import (step, step_fused, simulate,
                                run_protocol, StepAux)
from .utils.io import build_scene, read_cloud_csv, Scene
from .ops import electrophysiology as stim
from .models import variants

__all__ = [
    "SimConfig", "DEFAULT_CONFIG", "PARAM_FIELDS", "resolve_params",
    "ParticleState", "init_fluid",
    "save_checkpoint", "load_checkpoint", "step", "step_fused", "simulate",
    "StepAux", "run_protocol", "build_scene", "read_cloud_csv", "Scene",
    "stim", "variants",
]

__version__ = "0.4.0"
