"""Serving: a production inference engine for hand-pose prediction.

The reference's closest analogue is ``test.py``'s ad-hoc loop; this is
the deployment-shaped version: one compiled program per (model, batch
bucket), fixed shapes with padding, optional in-program preprocessing
(crop from full frames given detections), and warmup.  Single-chip by
default; the same predictor runs data-parallel over a mesh by
constructing it with ``mesh=...`` (params replicated, each request
chunk sharded over the ``data`` axis — buckets are multiples of the
data-axis size so every shard stays a static shape).

Example:
    predictor = HandPosePredictor.from_checkpoint(opt)
    out = predictor.predict(crops_uint8)        # [N,224,224,3]
    out["joints_3d"], out["joints_2d"], out["camera"]

    mesh = mesh_lib.make_mesh()                 # all chips, data axis
    predictor = HandPosePredictor.from_checkpoint(opt, mesh=mesh)
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu.config import Options
from scat_tpu.models import build_model
from scat_tpu.ops.geometry import batch_orth_proj_idrot, project_2d
from scat_tpu.parallel import mesh as mesh_lib
from scat_tpu.utils import checkpoint as ckpt_lib


def check_image_dtype(x: np.ndarray) -> None:
    """Enforce the request dtype contract: uint8 [0,255] or float [-1,1].

    The on-device ``/127.5 - 1`` normalization is only correct for
    uint8; any other integer dtype would be silently misscaled."""
    if (np.issubdtype(x.dtype, np.integer) or x.dtype == np.bool_) \
            and x.dtype != np.uint8:
        raise ValueError(
            f"integer inputs must be uint8 [0,255], got {x.dtype}; "
            "pass float crops already normalized to [-1,1] instead")


def pick_bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def bucket_ladder(max_batch: int, base: int = 1) -> list:
    """Power-of-two bucket sizes from ``base``, top clamped to
    ``max_batch``.  Plain doubling would overshoot a non-power-of-two
    cap (e.g. base 6, cap 60 -> ..., 48, 96 — compiling a program
    bigger than the configured HBM cap); the ladder is shared by the
    live predictor and ``export.ExportedPredictor`` so both serve the
    same compiled-program set."""
    buckets = [min(base, max_batch)]
    while buckets[-1] < max_batch:
        buckets.append(min(buckets[-1] * 2, max_batch))
    return buckets


def run_bucketed(forward, params, batch_stats, x: np.ndarray, buckets,
                 put, window: int = 4,
                 chunk_device_times: Optional[list] = None
                 ) -> Dict[str, np.ndarray]:
    """Stream a request through ``forward`` in bucket-sized chunks.

    Pads the request so every chunk is exactly a bucket size: full
    max-bucket chunks plus one bucketed remainder — the compiled-program
    count stays bounded by the bucket set even for oversized requests.
    A bounded in-flight window keeps a few chunks pipelined so chunk
    k+1's upload/compute overlaps chunk k's D2H, but fetches as it goes:
    an unbounded launch list would hold EVERY request chunk resident in
    HBM at once (a 50k-crop request is ~7.5 GB).

    ``chunk_device_times``: pass a list to record per-chunk DEVICE-side
    latency seconds (dispatch -> D2H complete, measured AFTER the
    request upload has finished) — the link-independent column of the
    serving latency table (benchmarks/bench_serving.py).  Timing blocks
    each chunk, so this mode disables the in-flight pipelining; use it
    for measurement, not the hot path."""
    n = x.shape[0]
    big = buckets[-1]
    rem = n % big
    total = (n - rem) + (pick_bucket(rem, buckets) if rem else 0)
    if total < max(n, 1):
        total = pick_bucket(n, buckets)
    if n < total:
        x = np.concatenate(
            [x, np.zeros((total - n,) + x.shape[1:], x.dtype)])
    starts = list(range(0, x.shape[0], big))
    inflight: list = []
    cams, j3ds, j2ds = [], [], []

    def drain_one():
        cam, j3d, j2d = inflight.pop(0)
        cams.append(np.asarray(cam))
        j3ds.append(np.asarray(j3d))
        j2ds.append(np.asarray(j2d))

    for s in starts:
        if len(inflight) >= window:
            drain_one()
        if chunk_device_times is None:
            inflight.append(
                forward(params, batch_stats, put(x[s:s + big])))
        else:
            xb = put(x[s:s + big])
            jax.block_until_ready(xb)          # upload complete
            t0 = time.perf_counter()
            out = forward(params, batch_stats, xb)
            # fetch the outputs to the HOST inside the timed window:
            # block_until_ready only waits for device compute, and the
            # column's published definition is dispatch -> D2H complete
            out = tuple(np.asarray(o) for o in out)
            chunk_device_times.append(time.perf_counter() - t0)
            inflight.append(out)
    while inflight:
        drain_one()
    return {"camera": np.concatenate(cams)[:n],
            "joints_3d": np.concatenate(j3ds)[:n],
            "joints_2d": np.concatenate(j2ds)[:n]}


@dataclasses.dataclass
class HandPosePredictor:
    model: object
    params: dict
    batch_stats: dict
    image_size: int = 224
    max_batch: int = 64
    mesh: Optional[object] = None  # jax.sharding.Mesh for data-parallel
    # frozen variables (ViP's FAVOR+ projection); jit closure constant
    constants: dict = dataclasses.field(default_factory=dict)

    @classmethod
    def from_checkpoint(cls, opt: Options, image_size: int = 224,
                        variables=None, mesh=None) -> "HandPosePredictor":
        model, _ = build_model(opt, image_size)
        if variables is None:
            sample = jnp.zeros((1, image_size, image_size, 3),
                               jnp.float32)
            variables = model.init(
                {"params": jax.random.key(0), "mask": jax.random.key(1),
                 "dropout": jax.random.key(2)}, sample, train=False)
            variables = dict(variables)
            # variables-level restore: handles reference ``.pth`` files
            # AND loads the trained BN running stats (params-only
            # loading would silently serve with init normalization);
            # ViP's frozen FAVOR+ projection rides the same single read
            p_, bs_, c_ = ckpt_lib.restore_variables_nonstrict(
                opt.checkpoint_path_eval, variables["params"],
                variables.get("batch_stats", {}),
                constants=dict(variables.get("constants", {})))
            variables["params"] = p_
            variables["batch_stats"] = bs_
            variables["constants"] = c_
        return cls(model=model, params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   image_size=image_size, mesh=mesh,
                   constants=dict(variables.get("constants", {})))

    def __post_init__(self):
        model = self.model
        from scat_tpu.models.performer import ViP
        if isinstance(model, ViP) and not self.constants:
            raise ValueError(
                "ViP predictors need constants= (the frozen FAVOR+ "
                "projection from the TrainState / import_torch_vip); "
                "apply() without it fails inside flax at the first "
                "request")
        if self.mesh is not None:
            # data-parallel serving: params live replicated on the mesh,
            # each request chunk is sharded over the data axis.  XLA
            # runs the same program per shard; no collectives are needed
            # in a pure forward, so throughput scales with chips.
            rep = mesh_lib.replicated(self.mesh)
            self._batch_sh = mesh_lib.batch_sharding(self.mesh)
            self.params = jax.device_put(self.params, rep)
            self.batch_stats = jax.device_put(self.batch_stats, rep)
            ndev = self.mesh.shape[mesh_lib.DATA_AXIS]
            if self.max_batch % ndev:
                self.max_batch = max(self.max_batch // ndev, 1) * ndev
            jit_kwargs = dict(
                in_shardings=(rep, rep, self._batch_sh),
                out_shardings=rep)
        else:
            self._batch_sh = None
            jit_kwargs = {}

        def _forward(params, batch_stats, images):
            # uint8 requests normalize ON DEVICE: the host uploads 4x
            # fewer bytes than float32 crops and skips a host-side
            # float conversion pass (jit specializes per input dtype,
            # so at most two programs per bucket exist)
            if jnp.issubdtype(images.dtype, jnp.integer):
                images = images.astype(jnp.float32) / 127.5 - 1.0
            variables = {"params": params, "batch_stats": batch_stats}
            if self.constants:
                variables["constants"] = self.constants
            out = model.apply(variables, images, train=False)
            pred = out[0] if isinstance(out, tuple) else out
            cam = pred[:, :3]
            j3d = pred[:, 3:66].reshape(-1, 21, 3)
            j2d = project_2d(batch_orth_proj_idrot(j3d, cam))
            return cam, j3d, j2d

        self._forward = jax.jit(_forward, **jit_kwargs)
        # bucketed batch sizes: powers of two up to max_batch (times the
        # data-axis size under a mesh, so every shard is a static
        # shape), so at most log2(max_batch)+1 compiled programs exist.
        # max_batch is already a data-axis multiple (rounded above).
        self._buckets = bucket_ladder(
            self.max_batch,
            base=1 if self.mesh is None
            else self.mesh.shape[mesh_lib.DATA_AXIS])

    def _bucket(self, n: int) -> int:
        return pick_bucket(n, self._buckets)

    def warmup(self, batch_size: Optional[int] = None) -> None:
        """Compile ahead of serving traffic."""
        sizes = [batch_size] if batch_size else self._buckets
        for b in sizes:
            for dtype in (jnp.uint8, jnp.float32):
                x = jnp.zeros((b, self.image_size, self.image_size, 3),
                              dtype)
                jax.block_until_ready(
                    self._forward(self.params, self.batch_stats, x))

    def predict(self, images,
                chunk_device_times: Optional[list] = None
                ) -> Dict[str, np.ndarray]:
        """``images``: [N,H,W,3] uint8 [0,255] or float [-1,1] crops.
        N is arbitrary; requests pad to the next bucket.  Returns numpy
        ``camera [N,3]``, ``joints_3d [N,21,3]`` (root-centered, meters),
        ``joints_2d [N,21,2]`` (crop pixels).

        ``chunk_device_times``: measurement mode — see run_bucketed."""
        x = np.asarray(images)
        check_image_dtype(x)
        # uint8 stays uint8: device-side normalization (see _forward)
        # moves 4x fewer bytes over the host->device link
        put = (jnp.asarray if self._batch_sh is None
               else lambda a: jax.device_put(a, self._batch_sh))
        return run_bucketed(self._forward, self.params,
                            self.batch_stats, x, self._buckets, put,
                            chunk_device_times=chunk_device_times)

    def predict_from_frames(self, frames: np.ndarray,
                            joints_2d_hint: np.ndarray
                            ) -> Dict[str, np.ndarray]:
        """Full frames + rough 2D detections -> crops (device warp) ->
        prediction.  ``frames`` [N,H,W,3] uint8; ``joints_2d_hint``
        [N,21,2] frame pixels (e.g. a detector's output or the previous
        frame's prediction, like the demo's fixed-window tracking)."""
        crops, M = frames_to_crops(frames, joints_2d_hint,
                                   self.image_size)
        out = self.predict(crops)
        out["crop_affine"] = M
        return out


def frames_to_crops(frames: np.ndarray, joints_2d_hint: np.ndarray,
                    image_size: int) -> tuple:
    """Detection-to-crop stage shared by the live predictor and the
    exported artifact: batched crop affine from the 2D hints, one fused
    bilinear warp on device.  Returns (crops [N,S,S,3] float32 [-1,1],
    crop_affine [N,2,3]) as numpy."""
    from scat_tpu.data import preprocess
    _, H, W, _ = frames.shape
    M, _ = preprocess.crop_hand_affine(
        jnp.asarray(joints_2d_hint, jnp.float32), W, H,
        image_size, expand=1.5, min_size=20.0)
    crops = preprocess.affine_sample(
        preprocess.normalize_to_unit(jnp.asarray(frames, jnp.float32)),
        M, image_size, image_size, fill=-1.0)
    return np.asarray(crops), np.asarray(M)
