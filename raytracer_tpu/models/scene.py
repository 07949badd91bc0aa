"""Scene: GLB → triangle-soup ingest with normalization.

API-parity port of the reference ``Scene`` class (src/libs/Scene.js), backed
by our own NumPy glTF parser instead of THREE.js. Triangles are held as SoA
``(N, 3, 3) float32`` (vertex-major) with derived centroids; the flat export
matches the reference ``getTrianglesFloat32`` layout of 9 floats per triangle
(Scene.js:230-241).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..utils.gltf import extract_triangles, load_gltf

__all__ = ["Scene"]


class Scene:
    """Triangle-soup scene container.

    Mirrors reference behavior (Scene.js):

    * ``load_glb(path, normalize=False, mode="cube")`` — parse + optional
      normalization. The Morton pre-sort that the reference ships commented
      out (Scene.js:41) is available as :meth:`sort_triangles` but is not
      called by default, matching the shipped behavior.
    * ``normalize_mesh`` — cube: longest AABB dimension scaled to [-1, 1]
      (scale = 2 / maxDim); sphere: scale = 1 / (maxDim / 2), both centered
      on the AABB midpoint (Scene.js:104-165).
    * ``get_triangles_float32`` — flat (9N,) float32 v0 v1 v2 layout.
    """

    def __init__(self) -> None:
        self.triangles: np.ndarray = np.zeros((0, 3, 3), dtype=np.float32)
        self._normalize_enabled = False
        self._normalize_mode = "cube"

    # -- loading -------------------------------------------------------------

    def load_glb(self, path: str | Path, *, normalize: bool = False, mode: str = "cube") -> "Scene":
        self._normalize_enabled = bool(normalize)
        self._normalize_mode = mode
        doc = load_gltf(path)
        self.triangles = extract_triangles(doc)
        if self._normalize_enabled:
            self.normalize_mesh()
        return self

    def set_triangles(self, tris: np.ndarray) -> "Scene":
        """Install a raw triangle array, shape (N, 3, 3) or flat (9N,)."""
        tris = np.asarray(tris, dtype=np.float32)
        if tris.ndim == 1:
            tris = tris.reshape(-1, 3, 3)
        self.triangles = tris
        return self

    # -- derived quantities ----------------------------------------------------

    @property
    def num_triangles(self) -> int:
        return int(self.triangles.shape[0])

    def centroids(self) -> np.ndarray:
        """Per-triangle centroid (mean of the 3 vertices), shape (N, 3)."""
        if self.num_triangles == 0:
            return np.zeros((0, 3), dtype=np.float32)
        return self.triangles.mean(axis=1, dtype=np.float32)

    # -- normalization ---------------------------------------------------------

    def normalize_mesh(self) -> None:
        """Center on AABB midpoint and rescale (Scene.js:104-165)."""
        if self.num_triangles == 0:
            return
        verts = self.triangles.reshape(-1, 3)
        mn = verts.min(axis=0)
        mx = verts.max(axis=0)
        center = (mn + mx) * np.float32(0.5)
        max_dim = np.float32((mx - mn).max())
        if self._normalize_mode == "sphere":
            scale = np.float32(1.0) / (max_dim * np.float32(0.5))
        else:  # "cube"
            scale = np.float32(2.0) / max_dim
        self.triangles = ((self.triangles - center[None, None, :]) * scale).astype(np.float32)

    # -- optional Morton pre-sort (shipped disabled in the reference) ----------

    def sort_triangles(self) -> None:
        """Spatially sort triangles by 30-bit Morton code of normalized
        centroids. Port of the reference's (unused) Scene.sortTriangles
        (Scene.js:170-225), kept for parity; note the reference app never
        calls it (Scene.js:41 is commented out).
        """
        if self.num_triangles == 0:
            return
        c = self.centroids().astype(np.float64)
        mn = c.min(axis=0)
        ext = c.max(axis=0) - mn
        ext = np.where(ext == 0.0, 1.0, ext)
        q = np.clip((c - mn) / ext * 1024.0, 0.0, 1023.0).astype(np.uint32)

        def expand(v: np.ndarray) -> np.ndarray:
            v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
            v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
            v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
            v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
            return v

        code = expand(q[:, 0]) | (expand(q[:, 1]) << np.uint32(1)) | (expand(q[:, 2]) << np.uint32(2))
        order = np.argsort(code, kind="stable")
        self.triangles = self.triangles[order]

    # -- export ------------------------------------------------------------------

    def get_triangles_float32(self) -> np.ndarray:
        """Flat (9N,) float32 — v0.xyz v1.xyz v2.xyz per triangle."""
        return np.ascontiguousarray(self.triangles, dtype=np.float32).reshape(-1)

    def get_triangles(self) -> np.ndarray:
        return self.triangles
