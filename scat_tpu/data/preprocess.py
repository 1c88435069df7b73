"""On-device fused preprocessing: flip / rotate / crop / resize /
normalize as ONE affine gather per image.

The reference does per-sample PIL/cv2 work in DataLoader worker processes
(hand_flip load_STB.py:69-74, rotate_img rotation.py:7-55, crop_hand
load_STB.py:76-96, Resize+ToTensor+Normalize load_STB.py:48-67).  Here
the same geometry composes into a single 2x3 affine per sample; the
pixel work is one batched bilinear gather on device (HBM-bandwidth
bound, fuses with the normalize), which is the BASELINE.json north-star
"fused on-device preprocessing stage".

Label math is numerically identical to the reference formulas and is
pure jnp (tested against them in tests/test_preprocess.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from scat_tpu.ops.geometry import rotation_matrix_2d


def affine_compose(A, B, xp=jnp):
    """Compose 2x3 affines: result(x) = A(B(x)); batched [...,2,3].
    ``xp`` selects the array module (numpy for host loader paths)."""
    RA, tA = A[..., :2], A[..., 2]
    RB, tB = B[..., :2], B[..., 2]
    R = RA @ RB
    t = xp.einsum("...ij,...j->...i", RA, tB) + tA
    return xp.concatenate([R, t[..., None]], axis=-1)


def affine_invert(M, xp=jnp):
    """Invert 2x3 affines; batched."""
    R, t = M[..., :2], M[..., 2]
    det = R[..., 0, 0] * R[..., 1, 1] - R[..., 0, 1] * R[..., 1, 0]
    inv = xp.stack([
        xp.stack([R[..., 1, 1], -R[..., 0, 1]], -1),
        xp.stack([-R[..., 1, 0], R[..., 0, 0]], -1),
    ], -2) / det[..., None, None]
    ti = -xp.einsum("...ij,...j->...i", inv, t)
    return xp.concatenate([inv, ti[..., None]], axis=-1)


def identity_affine(batch_shape=()) -> jax.Array:
    eye = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    return jnp.broadcast_to(eye, batch_shape + (2, 3))


def flip_affine(width, xp=jnp):
    """Horizontal mirror: x' = width - x (reference hand_flip
    load_STB.py:69-74 maps joints as [w,0] + (-x, y))."""
    w = xp.asarray(width, xp.float32)
    z = xp.zeros_like(w)
    one = xp.ones_like(w)
    return xp.stack([
        xp.stack([-one, z, w], -1),
        xp.stack([z, one, z], -1),
    ], -2)


def crop_hand_affine(joints_2d, img_w, img_h,
                     out_size: int = 224, expand: float = 1.3,
                     min_size: float = 10.0, max_size: float = 500.0,
                     center_joint: int = 4, xp=jnp):
    """Square crop about joint ``center_joint`` then resize to out_size.

    Exactly the reference crop_hand math (load_STB.py:76-96): half-size =
    clip(expand * max(max_coord-center, center-min_coord), min, max);
    joint remap (j + [-left,-top]) * (out/2s).  Returns (affine [B,2,3]
    output<-input mapping for joints, remapped joints).

    ``crop_hand_ref`` (eval.py:89-108) is this with expand=1.5,
    min_size=20.
    """
    img_w = xp.asarray(img_w, xp.float32)
    img_h = xp.asarray(img_h, xp.float32)
    center = joints_2d[..., center_joint, :]           # [B,2]
    size_vec = xp.stack([img_w, img_h], -1)
    min_coord = xp.maximum(joints_2d.min(axis=-2), 0.0)
    max_coord = xp.minimum(joints_2d.max(axis=-2), size_vec)
    half = xp.maximum(max_coord - center, center - min_coord)
    half = expand * half
    half = xp.max(half, axis=-1)
    half = xp.clip(half, min_size, max_size)          # [B]
    left = center[..., 0] - half
    top = center[..., 1] - half
    scale = out_size / (2.0 * half)
    z = xp.zeros_like(scale)
    M = xp.stack([
        xp.stack([scale, z, -left * scale], -1),
        xp.stack([z, scale, -top * scale], -1),
    ], -2)                                             # [B,2,3]
    ones = xp.ones_like(joints_2d[..., :1])
    joints_out = xp.einsum(
        "...ij,...nj->...ni", M,
        xp.concatenate([joints_2d, ones], axis=-1))
    return M, joints_out


def rotate_affine_expand(angle_deg: jax.Array, w, h, xp=jnp
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rotation about the image center with canvas expansion
    (reference rotation.py:7-30).  Returns (affine, new_w, new_h).
    NOTE: the expanded canvas size is data-dependent; for static shapes
    feed the affine into a fixed-size output and fold the expansion into
    the subsequent crop affine.  ``xp`` selects the array module (numpy
    for the native host path, which bakes this affine into the C++
    warp).
    """
    w = xp.asarray(w, xp.float32)
    h = xp.asarray(h, xp.float32)
    M = rotation_matrix_2d(angle_deg,
                           xp.stack([w // 2, h // 2], -1), xp=xp)
    cos = xp.abs(M[..., 0, 0])
    sin = xp.abs(M[..., 0, 1])
    nW = xp.floor(h * sin + w * cos)
    nH = xp.floor(h * cos + w * sin)
    shift = xp.stack([nW / 2 - w // 2, nH / 2 - h // 2], axis=-1)
    M = xp.concatenate([M[..., :2], (M[..., 2] + shift)[..., None]],
                       axis=-1)
    return M, nW, nH


def affine_sample(images: jax.Array, M_out_from_in: jax.Array,
                  out_h: int, out_w: int,
                  fill: float = 0.0) -> jax.Array:
    """Batched bilinear warp: output[b, y, x] = image[b, M^-1 (x,y)].

    ``images`` [B,H,W,C] float; ``M_out_from_in`` [B,2,3] maps INPUT px
    -> OUTPUT px (the label affine); sampling uses its inverse.  Out-of-
    bounds reads return ``fill`` (PIL crop pads with black).
    """
    B, H, W, C = images.shape
    Minv = affine_invert(M_out_from_in)                # output -> input
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                      # [oh,ow]
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # [oh,ow,3]
    src = jnp.einsum("bij,hwj->bhwi", Minv, grid)      # [B,oh,ow,2]
    sx, sy = src[..., 0], src[..., 1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(images, yi_c,
                                                         xi_c)
        return jnp.where(valid[..., None], vals, fill)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def normalize_to_unit(images: jax.Array) -> jax.Array:
    """Pixels in [0,255] (uint8 or float) -> [-1,1]
    (ToTensor + Normalize((.5,.5,.5),(.5,.5,.5)), reference
    load_STB.py:51-52).  The input contract is byte-range pixels; the
    dtype does not matter (no value-dependent heuristics, which would
    misclassify near-black frames)."""
    x = images.astype(jnp.float32) / 255.0
    return x * 2.0 - 1.0


def fused_crop_pipeline(images: jax.Array, joints_2d: jax.Array,
                        flip: bool = True,
                        angle_deg: Optional[jax.Array] = None,
                        out_size: int = 224
                        ) -> Tuple[jax.Array, jax.Array]:
    """flip -> (rotate) -> crop -> resize -> normalize, one gather.

    Mirrors the reference per-sample chain (load_STB.py:263-274) with the
    canvas-expansion rotation folded into the crop affine so output
    shapes stay static.
    """
    B, H, W, C = images.shape
    M = flip_affine(jnp.full((B,), W)) if flip \
        else identity_affine((B,))
    ones = jnp.ones_like(joints_2d[..., :1])

    def apply(M, j):
        return jnp.einsum("bij,bnj->bni", M,
                          jnp.concatenate([j, ones], -1))

    joints = apply(M, joints_2d)
    crop_w = jnp.full((B,), float(W))
    crop_h = jnp.full((B,), float(H))
    if angle_deg is not None:
        # after canvas-expansion rotation the joints live in the
        # expanded nW x nH frame; the crop bounds must clamp against
        # THAT canvas (reference crop_hand uses the rotated image.size,
        # load_STB.py:76-96 after rotation.py:22-30)
        R, nW, nH = rotate_affine_expand(angle_deg, W, H)
        M = affine_compose(R, M)
        joints = apply(M, joints_2d)
        crop_w, crop_h = nW, nH
    Mc, joints = crop_hand_affine(joints, crop_w, crop_h, out_size)
    M = affine_compose(Mc, M)
    out = affine_sample(normalize_to_unit(images), M, out_size, out_size,
                        fill=-1.0)
    return out, joints


def color_jitter(key: jax.Array, images: jax.Array,
                 brightness: float = 0.5, contrast: float = 0.5,
                 saturation: float = 0.5, hue: float = 0.1) -> jax.Array:
    """Device ColorJitter over a batch in [-1,1] NHWC (the train-split
    augmentation of the FreiHAND-style transform, reference
    load_test_dataset.py:72-79).

    Matches torchvision semantics: factors drawn uniformly from
    [max(0, 1-x), 1+x] for brightness/contrast/saturation and
    [-hue, hue] for hue; the FOUR ops apply in a per-call random order
    with clamping to [0,1] after each (torchvision blends then clamps
    per op); contrast/saturation blend against the ITU-R 601 luma
    grayscale like torchvision's rgb_to_grayscale.  Hue uses a YIQ
    chroma rotation — the one documented approximation (torchvision
    round-trips through HSV).

    Eager-mode utility for the host loader loop (the op order is drawn
    on the host; under jit the order would freeze at trace time).
    """
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    B = images.shape[0]
    keys = {"brightness": kb, "contrast": kc, "saturation": ks}

    def factor(name, amt):
        return jax.random.uniform(keys[name], (B, 1, 1, 1),
                                  minval=max(0.0, 1.0 - amt),
                                  maxval=1.0 + amt)

    def theta(amt):
        return jax.random.uniform(kh, (B, 1, 1), minval=-amt,
                                  maxval=amt) * 2 * jnp.pi

    import numpy as _np
    order = _np.asarray(jax.random.permutation(kp, 4))
    return _jitter_apply(jnp, images, order, factor, theta,
                         brightness, contrast, saturation, hue)


def _jitter_apply(xp, images, order, factor, theta, brightness,
                  contrast, saturation, hue):
    """Shared torchvision-semantics jitter math for the device
    (``xp=jnp``) and loader-thread (``xp=np``) paths; callers supply the
    RNG draws (op ``order``, per-op ``factor(name, amt)``, hue
    ``theta(amt)``) so each keeps its own stream."""

    def luma(x):
        return (0.299 * x[..., 0] + 0.587 * x[..., 1]
                + 0.114 * x[..., 2])[..., None]

    def do_brightness(x):
        return xp.clip(x * factor("brightness", brightness), 0.0, 1.0)

    def do_contrast(x):
        mean = luma(x).mean(axis=(1, 2, 3), keepdims=True)
        return xp.clip((x - mean) * factor("contrast", contrast) + mean,
                       0.0, 1.0)

    def do_saturation(x):
        grey = luma(x)
        return xp.clip((x - grey) * factor("saturation", saturation)
                       + grey, 0.0, 1.0)

    def do_hue(x):
        if hue <= 0:
            return x
        th = theta(hue)
        y = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
        i = (0.596 * x[..., 0] - 0.274 * x[..., 1] - 0.322 * x[..., 2])
        q = (0.211 * x[..., 0] - 0.523 * x[..., 1] + 0.312 * x[..., 2])
        ir = i * xp.cos(th) - q * xp.sin(th)
        qr = i * xp.sin(th) + q * xp.cos(th)
        r = y + 0.956 * ir + 0.621 * qr
        g = y - 0.272 * ir - 0.647 * qr
        b = y - 1.106 * ir + 1.703 * qr
        return xp.clip(xp.stack([r, g, b], axis=-1), 0.0, 1.0)

    ops = [do_brightness, do_contrast, do_saturation, do_hue]
    x = (images + 1.0) * 0.5  # [0,1]
    for idx in order:
        x = ops[int(idx)](x)
    return x * 2.0 - 1.0


def color_jitter_np(rng, images, brightness: float = 0.5,
                    contrast: float = 0.5, saturation: float = 0.5,
                    hue: float = 0.1):
    """Host-side ColorJitter: same torchvision semantics as
    ``color_jitter`` (one shared ``_jitter_apply`` core) but pure numpy,
    for loader/prefetch threads where eager jnp dispatch would contend
    with the training step (the same xp=np rule as stb.py's affine
    math).  ``rng`` is a ``np.random.RandomState``; ``images``
    [B,H,W,3] float in [-1,1]."""
    import numpy as np
    B = images.shape[0]

    def factor(name, amt):
        return rng.uniform(max(0.0, 1.0 - amt), 1.0 + amt,
                           size=(B, 1, 1, 1)).astype(np.float32)

    def theta(amt):
        return rng.uniform(-amt, amt, size=(B, 1, 1)).astype(
            np.float32) * 2 * np.pi

    out = _jitter_apply(np, images, rng.permutation(4), factor, theta,
                        brightness, contrast, saturation, hue)
    return out.astype(images.dtype, copy=False)
