"""AOT serving export: freeze the compiled forward into an artifact.

``export_predictor`` serializes the serving forward pass (preprocess →
model → weak-perspective projection, the same program
``serving.HandPosePredictor`` jits) to **StableHLO** via ``jax.export``
with a *symbolic batch dimension*, alongside the weights, into a
directory:

    manifest.json            format/shape/dtype/bucket metadata
    forward_uint8.stablehlo  Exported fn, [b, S, S, 3] uint8 requests
    forward_float32.stablehlo  ... float requests already in [-1, 1]
    weights.npz              params + batch_stats, flat keys (constants
                             are baked into the programs, not inputs)

``load_artifact`` rehydrates it into an ``ExportedPredictor`` whose
``predict`` matches ``HandPosePredictor.predict`` (bucketing, padding,
bounded in-flight window) — WITHOUT importing any model code: the
artifact carries the program.  That is the production deployment story
the reference lacks entirely (its closest analogue is the ad-hoc loop in
``/root/reference/test.py:272-439``, which needs the full source tree,
checkpoints and a live torch install on the serving host).

Because the batch dimension is symbolic, one artifact serves every
bucket; ``jax.jit`` specializes per concrete request shape at load time
(bounded by the bucket set, as in live serving).  Exports are
platform-checked: serving on a platform the artifact wasn't lowered for
raises at call time, so pass ``platforms=["tpu", "cpu"]`` to build one
artifact for both TPU serving and CPU integration tests.

CLI:
    python -m scat_tpu.export --net reg_transformer \
        --checkpoint_path_eval .../hand_net_final.pth --export_dir out/
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from scat_tpu.serving import (HandPosePredictor, check_image_dtype,
                              run_bucketed)

_MANIFEST = "manifest.json"
_WEIGHTS = "weights.npz"
_FORMAT = 1
# numpy's .npz cannot store ml_dtypes custom dtypes; such leaves ship
# bit-cast to a same-width integer and are restored by key
_BITCAST = {"bfloat16": "uint16", "float8_e4m3fn": "uint8",
            "float8_e5m2": "uint8"}


def _flatten(tree, prefix: str) -> Dict[str, np.ndarray]:
    """Flatten a nested-dict pytree to ``prefix/key/.../leaf`` arrays."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = [prefix]
        for entry in path:
            key = getattr(entry, "key", getattr(entry, "idx", None))
            key = str(key)
            if "/" in key:
                raise ValueError(
                    f"cannot export: tree key {key!r} contains '/'")
            parts.append(key)
        flat["/".join(parts)] = np.asarray(leaf)
    return flat


def _unflatten(flat: Dict[str, np.ndarray], prefix: str) -> dict:
    """Rebuild the nested dict for one ``prefix`` from flat keys."""
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        if parts[0] != prefix:
            continue
        node = tree
        for part in parts[1:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def export_predictor(predictor: HandPosePredictor, out_dir: str,
                     platforms: Optional[Sequence[str]] = None) -> None:
    """Write a self-contained serving artifact for ``predictor``.

    ``platforms``: lowering targets (default: the current backend).
    Mesh-mode predictors are refused — the artifact is a single-chip
    program; shard requests across chips by loading it once per chip
    (or serve live with ``HandPosePredictor(mesh=...)``).
    """
    if predictor.mesh is not None:
        raise ValueError(
            "export_predictor requires a single-chip predictor "
            "(mesh=None); load the artifact once per chip instead")
    os.makedirs(out_dir, exist_ok=True)
    size = predictor.image_size

    def spec_of(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x),
                                           jnp.asarray(x).dtype), tree)

    params_spec = spec_of(predictor.params)
    stats_spec = spec_of(predictor.batch_stats)
    batch_shape = jax_export.symbolic_shape(f"b, {size}, {size}, 3")
    dtypes = ["uint8", "float32"]
    for name in dtypes:
        image_spec = jax.ShapeDtypeStruct(batch_shape, jnp.dtype(name))
        exported = jax_export.export(
            predictor._forward, platforms=list(platforms)
            if platforms else None)(params_spec, stats_spec, image_spec)
        with open(os.path.join(out_dir, f"forward_{name}.stablehlo"),
                  "wb") as f:
            f.write(exported.serialize())

    # constants (e.g. ViP's frozen FAVOR+ projection) are NOT stored:
    # _forward closes over them, so they are baked into the StableHLO
    # blobs and are not call inputs — an npz copy would be dead weight
    # that misleads readers into editing values the program never reads
    # (params/batch_stats ARE inputs; editing those in the npz works)
    flat = _flatten(predictor.params, "params")
    flat.update(_flatten(predictor.batch_stats, "batch_stats"))
    bitcast = {}
    for key, value in list(flat.items()):
        custom = _BITCAST.get(str(value.dtype))
        if custom is not None:
            bitcast[key] = str(value.dtype)
            flat[key] = value.view(custom)
    np.savez(os.path.join(out_dir, _WEIGHTS), **flat)
    manifest = {
        "format": _FORMAT,
        "image_size": size,
        "max_batch": predictor.max_batch,
        "dtypes": dtypes,
        "bitcast": bitcast,
        "platforms": list(platforms) if platforms
        else [jax_export.default_export_platform()],
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)


class ExportedPredictor:
    """Serve from an exported artifact — no model code, no checkpoint.

    Same request contract as ``HandPosePredictor.predict``: ``[N,S,S,3]``
    uint8 [0,255] or float [-1,1] crops, any N; returns numpy ``camera
    [N,3]``, ``joints_3d [N,21,3]`` (root-centered, meters), ``joints_2d
    [N,21,2]`` (crop pixels)."""

    def __init__(self, path: str):
        with open(os.path.join(path, _MANIFEST)) as f:
            manifest = json.load(f)
        if manifest["format"] != _FORMAT:
            raise ValueError(
                f"artifact format {manifest['format']} != {_FORMAT}")
        self.image_size = int(manifest["image_size"])
        self.max_batch = int(manifest["max_batch"])
        self.platforms = manifest["platforms"]
        with np.load(os.path.join(path, _WEIGHTS)) as data:
            flat = {k: data[k] for k in data.files}
        for key, dtype in manifest["bitcast"].items():
            flat[key] = flat[key].view(dtype)
        self.params = _unflatten(flat, "params")
        self.batch_stats = _unflatten(flat, "batch_stats")
        self._fns = {}
        for name in manifest["dtypes"]:
            with open(os.path.join(path, f"forward_{name}.stablehlo"),
                      "rb") as f:
                blob = f.read()
            # jit around .call: compiles once per concrete batch shape
            # (bounded by the bucket set, as in live serving)
            self._fns[name] = jax.jit(
                jax_export.deserialize(bytearray(blob)).call)
        from scat_tpu.serving import bucket_ladder
        self._buckets = bucket_ladder(self.max_batch)

    def predict(self, images) -> Dict[str, np.ndarray]:
        x = np.asarray(images)
        check_image_dtype(x)
        name = "uint8" if x.dtype == np.uint8 else "float32"
        x = x if name == "uint8" else x.astype(np.float32)
        forward = self._fns.get(name)
        if forward is None:
            raise ValueError(
                f"artifact was not exported for {name} inputs")
        return run_bucketed(forward, self.params, self.batch_stats, x,
                            self._buckets, jnp.asarray)

    def predict_from_frames(self, frames, joints_2d_hint):
        """Full frames + rough 2D detections -> crops -> prediction
        (same contract as ``HandPosePredictor.predict_from_frames``)."""
        from scat_tpu.serving import frames_to_crops
        crops, M = frames_to_crops(np.asarray(frames),
                                   np.asarray(joints_2d_hint),
                                   self.image_size)
        out = self.predict(crops)
        out["crop_affine"] = M
        return out


def load_artifact(path: str) -> ExportedPredictor:
    return ExportedPredictor(path)


def main() -> None:
    from scat_tpu.config import BaseOptions
    opt = BaseOptions().parse()
    predictor = HandPosePredictor.from_checkpoint(opt)
    export_predictor(predictor, opt.export_dir)
    files = sorted(os.listdir(opt.export_dir))
    total = sum(os.path.getsize(os.path.join(opt.export_dir, f))
                for f in files)
    print(f"exported {opt.net} -> {opt.export_dir} "
          f"({len(files)} files, {total / 1e6:.1f} MB)")
    for f in files:
        print(f"  {f}")


if __name__ == "__main__":
    main()
