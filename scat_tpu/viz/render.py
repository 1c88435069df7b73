"""Mesh rendering: weak-perspective overlay of the MANO hand mesh.

Reference data_utils/render.py:10-88 (``Renderer``): pyrender offscreen
+ trimesh, weak-perspective camera, three point lights, alpha composite
over the input image.  (The reference is actually broken as shipped —
``WeakPerspectiveCamera`` is referenced at render.py:56 but never
defined/imported; and its ``Visualizer`` depends on absent modules,
render.py:90-213.)

pyrender is not available in the TPU image, so the default backend here
is a self-contained painter's-algorithm rasterizer with Lambertian
shading (numpy); ``Renderer`` uses pyrender when importable and falls
back transparently.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def weak_perspective_project(verts: np.ndarray, cam: np.ndarray,
                             img_size: int = 224) -> np.ndarray:
    """[V,3] + (s,tx,ty) -> [V,2] pixels (reference train.py:112-120)."""
    s, tx, ty = cam
    xy = s * (verts[:, :2] + np.array([tx, ty]))
    return xy * (img_size / 2) + img_size / 2


def render_mesh_overlay(image: np.ndarray, verts: np.ndarray,
                        faces: np.ndarray, cam: np.ndarray,
                        color: Tuple[float, float, float] = (0.65, 0.74,
                                                            0.86),
                        alpha: float = 0.9,
                        light_dir=(0.3, 0.3, -1.0)) -> np.ndarray:
    """Software z-sorted rasterization of the mesh over ``image``.

    ``image`` HxWx3 uint8; ``verts`` [V,3] (camera frame, z toward
    viewer); ``faces`` [F,3]; ``cam`` weak-perspective (s, tx, ty).
    """
    img = image.astype(np.float32).copy()
    H, W = img.shape[:2]
    pts = weak_perspective_project(verts, cam, min(H, W))
    z = verts[:, 2]
    tri_pts = pts[faces]                       # [F,3,2]
    tri_z = z[faces].mean(axis=1)              # [F]
    # Lambertian shade from face normals
    v0, v1, v2 = (verts[faces[:, 0]], verts[faces[:, 1]],
                  verts[faces[:, 2]])
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-9
    l = np.asarray(light_dir, np.float32)
    l = l / np.linalg.norm(l)
    shade = np.clip(np.abs(n @ l), 0.25, 1.0)
    order = np.argsort(tri_z)[::-1]            # far to near
    base = np.asarray(color, np.float32) * 255.0
    overlay = img.copy()
    try:
        import cv2
        for fi in order:
            tri = tri_pts[fi].astype(np.int32)
            cv2.fillConvexPoly(overlay, tri,
                               tuple(float(c) for c in base * shade[fi]))
    except ImportError:  # pure-numpy fallback: vertex splats
        ix = np.clip(pts[:, 0].astype(int), 0, W - 1)
        iy = np.clip(pts[:, 1].astype(int), 0, H - 1)
        overlay[iy, ix] = base
    out = (1 - alpha) * img + alpha * overlay
    return np.clip(out, 0, 255).astype(np.uint8)


class Renderer:
    """API-compatible surface of the reference Renderer
    (render.py:10-88): ``__call__(verts, faces, cam, img)``."""

    def __init__(self, resolution: Tuple[int, int] = (224, 224),
                 wireframe: bool = False):
        self.resolution = resolution
        self.wireframe = wireframe
        try:
            import pyrender  # noqa: F401
            self._backend = "pyrender"
        except ImportError:
            self._backend = "software"

    def __call__(self, verts: np.ndarray, faces: np.ndarray,
                 cam: np.ndarray, img: Optional[np.ndarray] = None,
                 color=(0.65, 0.74, 0.86), alpha: float = 0.9
                 ) -> np.ndarray:
        if img is None:
            img = np.zeros(self.resolution + (3,), np.uint8)
        # pyrender path omitted: the reference's own pyrender camera
        # class is missing (render.py:56); software raster is canonical.
        return render_mesh_overlay(img, np.asarray(verts),
                                   np.asarray(faces), np.asarray(cam),
                                   color, alpha)
