"""Disney material model.

Twin of PT_sv5_/Material.h: same parameter set and defaults (Material.h:13-38),
the specular→IOR inference rule (Material.h:40-46), and the shadow-catcher flag
(Material.h:9). Host-side a material is a small dataclass; on device the scene
carries a ``MaterialTable`` — one SoA array per parameter — and shading gathers
per-ray parameter vectors by material id (the TPU-native replacement for the
per-mesh SBT record, LaunchParams.h:38-47).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MATERIAL_FLAG_NONE = 0
MATERIAL_FLAG_SHADOW_CATCHER = 1 << 0  # Material.h:9


@dataclasses.dataclass
class Material:
    """One material, reference defaults (Material.h:13-38)."""

    color: Tuple[float, float, float] = (1.0, 0.0, 0.0)
    emission: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    absorption: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    eta: float = 1.4
    metallic: float = 0.5
    subsurface: float = 0.0
    specular: float = 1.0
    roughness: float = 1.0
    specular_tint: float = 1.0
    anisotropic: float = 0.0
    sheen: float = 0.0
    sheen_tint: float = 0.0
    clearcoat: float = 0.0
    clearcoat_gloss: float = 1.0
    transmission: float = 0.4
    bump: float = 0.0
    flags: int = MATERIAL_FLAG_NONE

    def index_of_refraction(self) -> float:
        """eta, or inferred from specular when eta == 0 (Material.h:40-46)."""
        if self.eta == 0.0:
            return 2.0 / (1.0 - float(np.sqrt(0.08 * self.specular))) - 1.0
        return self.eta


_SCALAR_FIELDS = (
    "eta",
    "metallic",
    "subsurface",
    "specular",
    "roughness",
    "specular_tint",
    "anisotropic",
    "sheen",
    "sheen_tint",
    "clearcoat",
    "clearcoat_gloss",
    "transmission",
    "bump",
)
_VEC_FIELDS = ("color", "emission", "absorption")


@dataclasses.dataclass(frozen=True)
class MaterialTable:
    """SoA table of M materials; a pytree of (M,) / (M,3) arrays.

    ``packed`` (M, 24) carries every parameter in one row so the per-ray
    material lookup is a SINGLE row gather (17 separate per-field gathers
    measured ~0.5 s/frame in profiles); ``gather`` reconstructs the field
    views from the gathered rows.
    """

    color: jnp.ndarray  # (M, 3)
    emission: jnp.ndarray  # (M, 3)
    absorption: jnp.ndarray  # (M, 3)
    eta: jnp.ndarray  # (M,)
    metallic: jnp.ndarray
    subsurface: jnp.ndarray
    specular: jnp.ndarray
    roughness: jnp.ndarray
    specular_tint: jnp.ndarray
    anisotropic: jnp.ndarray
    sheen: jnp.ndarray
    sheen_tint: jnp.ndarray
    clearcoat: jnp.ndarray
    clearcoat_gloss: jnp.ndarray
    transmission: jnp.ndarray
    bump: jnp.ndarray
    flags: jnp.ndarray  # (M,) int32
    packed: jnp.ndarray  # (M, 24) f32 (flags bitcast into column 22)
    # static build-time fact: does ANY material carry the shadow-catcher
    # flag? Gates the integrator's catcher pass-through rounds so
    # catcher-free scenes pay zero traversal work for them (meta field —
    # part of the jit cache key, not the pytree data).
    has_catcher: bool = False

    @property
    def num_materials(self) -> int:
        return self.color.shape[0]

    @staticmethod
    def packed_rows_numpy(materials: Sequence[Material]) -> np.ndarray:
        """Host-side (M, 24) packed rows — also embedded per-triangle into
        SceneGeometry.tri_pack so the shading material lookup rides the one
        triangle-attribute row gather (a separate (M,24) gather at 1.9M rays
        measured ~14 ms/bounce)."""
        if not materials:
            materials = [Material()]
        packed = np.zeros((len(materials), 24), dtype=np.float32)
        for i, m in enumerate(materials):
            packed[i, 0:3] = m.color
            packed[i, 3:6] = m.emission
            packed[i, 6:9] = m.absorption
            for j, f in enumerate(_SCALAR_FIELDS):
                v = m.index_of_refraction() if f == "eta" else getattr(m, f)
                packed[i, 9 + j] = v
        packed[:, 22] = np.array(
            [m.flags for m in materials], dtype=np.int32
        ).view(np.float32)
        return packed

    @staticmethod
    def from_materials(materials: Sequence[Material]) -> "MaterialTable":
        # Build EVERYTHING in numpy first, then upload the whole table with
        # one device_put: any np.asarray of a device array here is a host
        # round trip (~0.5 s each over the axon tunnel — 17 of them made
        # "scene build" cost 30 s in round 1).
        if not materials:
            materials = [Material()]
        kw = {}
        for f in _VEC_FIELDS:
            kw[f] = np.array([getattr(m, f) for m in materials], dtype=np.float32)
        for f in _SCALAR_FIELDS:
            vals = []
            for m in materials:
                v = m.index_of_refraction() if f == "eta" else getattr(m, f)
                vals.append(v)
            kw[f] = np.array(vals, dtype=np.float32)
        kw["flags"] = np.array([m.flags for m in materials], dtype=np.int32)
        kw["packed"] = MaterialTable.packed_rows_numpy(materials)
        has_catcher = bool(
            np.any((kw["flags"] & MATERIAL_FLAG_SHADOW_CATCHER) != 0)
        )
        return MaterialTable(**jax.device_put(kw), has_catcher=has_catcher)

    def view_rows(self, g: jnp.ndarray) -> "MaterialTable":
        """Field views over ALREADY-gathered (N, 24) packed rows — e.g. the
        material columns riding SceneGeometry.tri_pack's row gather."""
        import jax as _jax

        kw = {
            "color": g[:, 0:3],
            "emission": g[:, 3:6],
            "absorption": g[:, 6:9],
        }
        for j, f in enumerate(_SCALAR_FIELDS):
            kw[f] = g[:, 9 + j]
        kw["flags"] = _jax.lax.bitcast_convert_type(g[:, 22], jnp.int32)
        kw["packed"] = g
        return MaterialTable(**kw, has_catcher=self.has_catcher)

    def gather(self, ids: jnp.ndarray) -> "MaterialTable":
        """Per-ray material parameters via ONE packed-row gather."""
        ids = jnp.clip(ids, 0, self.num_materials - 1)
        return self.view_rows(jnp.take(self.packed, ids, axis=0))


jax.tree_util.register_dataclass(
    MaterialTable,
    data_fields=[
        f.name
        for f in dataclasses.fields(MaterialTable)
        if f.name != "has_catcher"
    ],
    meta_fields=["has_catcher"],
)
