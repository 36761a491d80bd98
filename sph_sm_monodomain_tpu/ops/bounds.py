"""Axis-aligned bounding box (AABB) utilities.

Functional replacement for Math3D's m3Bounds (component M5,
/root/reference/Math3D/m3Bounds.h:9-99). The simulation path uses only
`clamp` (Update_Properties, SPH_SM_monodomain.cpp:649); the rest is kept
for API parity. Two reference quirks are reproduced behind flags:

  - `contain` only tests x and y (m3Bounds.h:70-74 — a 2D leftover);
  - the offset variant of `clamp` also only handles x and y
    (m3Bounds.h:90-96).

Pass strict=False for the corrected 3D semantics.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=["min", "max"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class Bounds:
    """AABB with (3,) min/max corners (m3Bounds.h:9-99)."""

    min: jax.Array
    max: jax.Array

    @classmethod
    def of(cls, lo, hi) -> "Bounds":
        return cls(min=jnp.asarray(lo, jnp.float32),
                   max=jnp.asarray(hi, jnp.float32))

    @classmethod
    def empty(cls) -> "Bounds":
        """setEmpty (m3Bounds.h:33-37): min=+BOUNDS_MAX, max=-BOUNDS_MAX."""
        big = jnp.full((3,), 3.4e38, jnp.float32)
        return cls(min=big, max=-big)

    def is_empty(self) -> jax.Array:
        return jnp.any(self.min > self.max)

    def combine(self, other: "Bounds") -> "Bounds":
        """Union (m3Bounds.h:55-58)."""
        return Bounds(min=jnp.minimum(self.min, other.min),
                      max=jnp.maximum(self.max, other.max))

    def intersect(self, other: "Bounds") -> "Bounds":
        """Intersection (m3Bounds.h:60-63)."""
        return Bounds(min=jnp.maximum(self.min, other.min),
                      max=jnp.minimum(self.max, other.max))

    def include(self, v) -> "Bounds":
        """Grow to include point(s) v (m3Bounds.h:65-68)."""
        v = jnp.atleast_2d(jnp.asarray(v))
        return Bounds(min=jnp.minimum(self.min, v.min(axis=0)),
                      max=jnp.maximum(self.max, v.max(axis=0)))

    def contain(self, v, strict: bool = True) -> jax.Array:
        """Membership test. strict=True reproduces the reference's 2D
        leftover: only x and y are checked (m3Bounds.h:70-74)."""
        v = jnp.asarray(v)
        ok = (self.min <= v) & (v <= self.max)
        return jnp.all(ok[..., :2], axis=-1) if strict \
            else jnp.all(ok, axis=-1)

    def center(self) -> jax.Array:
        """getCenter (m3Bounds.h:81-83)."""
        return (self.min + self.max) * 0.5

    def clamp(self, pos: jax.Array) -> jax.Array:
        """Componentwise clamp into the box (m3Bounds.h:85-89) — the live
        call in Update_Properties (cpp:649). Empty boxes pass through."""
        clamped = jnp.clip(pos, self.min, self.max)
        return jnp.where(self.is_empty(), pos, clamped)

    def clamp_offset(self, pos: jax.Array, offset: float,
                     strict: bool = True) -> jax.Array:
        """Inset clamp. strict=True reproduces the 2D leftover: z is not
        clamped (m3Bounds.h:90-96)."""
        lo = self.min + offset
        hi = self.max - offset
        clamped = jnp.clip(pos, lo, hi)
        if strict:
            clamped = clamped.at[..., 2].set(pos[..., 2])
        return jnp.where(self.is_empty(), pos, clamped)
