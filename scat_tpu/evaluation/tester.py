"""FrankMocap/MANO inference flow — reference ``test.py``.

Per batch over a folder of RGB crops (reference test.py:272-439): H3DW
encoder -> split camera(3)/pose(48)/shape(10) -> MANO decode via
rot_pose_beta_to_mesh (joints 21 + verts 778, reference test.py:344-348
-> mano.py:280-391) -> weak-perspective projection -> skeleton overlay
PNGs + per-image feature dumps.

The reference's ``dataset/inference.py`` (Inference class) is MISSING;
scat_tpu.data.testset.TestDataset provides the folder-of-images
contract (reference test.py:297-303 uses ./rgb/).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu.config import Options
from scat_tpu.data.testset import get_loader_test
from scat_tpu.models import build_model
from scat_tpu.models import mano as mano_lib
from scat_tpu.ops.geometry import batch_orth_proj_idrot, project_2d
from scat_tpu.utils import checkpoint as ckpt_lib
from scat_tpu.viz import draw


class Tester:
    """``Tester(opt).test(test_dir)`` (reference test.py:162-439)."""

    def __init__(self, opt: Options, variables=None,
                 image_size: int = 224):
        self.opt = opt
        self.image_size = image_size
        self.result_dir = opt.result_dir
        os.makedirs(self.result_dir, exist_ok=True)
        # --hand_choice gates the parameter decode (reference
        # eval.py:368, config.py:39).  'mano' is the live path
        # (test.py:344-348).  The reference's 'smplx' branch is broken as
        # shipped: the get_smplx_output call is commented out
        # (test.py:343) leaving pred_verts_3d undefined, and the SMPLX
        # body model pickle it needs is not distributed — so that choice
        # fails loudly here instead of silently decoding MANO.
        if opt.hand_choice != "mano":
            raise ValueError(
                f"--hand_choice {opt.hand_choice!r}: only 'mano' is "
                "functional (the reference's smplx decode is commented "
                "out at test.py:343 and crashes as shipped)")
        opt_fm = opt if opt.net == "frankmocap" else \
            __import__("dataclasses").replace(opt, net="frankmocap")
        self.model, self.mean_params = build_model(opt_fm, image_size)
        self.mano = mano_lib.ManoModel.from_data()
        if variables is None:
            sample = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            variables = self.model.init(jax.random.key(0), sample,
                                        train=False)
            variables = dict(variables)
            # merge any saved 'constants' collection from the same
            # checkpoint read (the Tester always builds the frankmocap
            # head, which has none — kept for consistency with the
            # Evaluator/DemoRunner restore shape)
            p_, bs_, c_ = ckpt_lib.restore_variables_nonstrict(
                opt.checkpoint_path_eval, variables["params"],
                variables.get("batch_stats", {}),
                constants=dict(variables.get("constants", {})))
            variables["params"] = p_
            variables["batch_stats"] = bs_
            variables["constants"] = c_
        self.variables = {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})}
        if variables.get("constants"):  # ViP's frozen FAVOR+ projection
            self.variables["constants"] = variables["constants"]

        @jax.jit
        def forward(images):
            feat, pred = self.model.apply(self.variables, images,
                                          train=False)
            cam = pred[:, :3]
            rots = pred[:, 3:6]
            poses = pred[:, 6:51]
            shapes = pred[:, 51:61]
            out = mano_lib.rot_pose_beta_to_mesh(self.mano, rots, poses,
                                                 shapes)
            joints = out[:, :21]
            verts = out[:, 21:]
            j2d = project_2d(batch_orth_proj_idrot(joints, cam))
            return pred, joints, verts, j2d

        self._forward = forward

    def test(self, test_dir: str = "./rgb/"):
        dataset = get_loader_test(test_dir, self.opt)
        results = []
        for image, w, h, name in dataset:
            pred, joints, verts, j2d = self._forward(image[None])
            stem = os.path.splitext(name)[0]
            # overlay (reference test.py:351-439 saves skeleton PNGs)
            self._save_overlay(np.asarray(image), np.asarray(j2d)[0],
                               stem)
            # per-image parameter dump (the reference's feature txt)
            np.savetxt(os.path.join(self.result_dir, f"{stem}_params.txt"),
                       np.asarray(pred)[0])
            results.append({
                "name": name,
                "pred_params": np.asarray(pred)[0],
                "joints_3d": np.asarray(joints)[0],
                "verts": np.asarray(verts)[0],
                "joints_2d": np.asarray(j2d)[0],
            })
        return results

    def _save_overlay(self, image_float, j2d, stem):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception as e:  # pragma: no cover
            print(f"matplotlib unavailable, skipping overlay: {e}")
            return
        fig = plt.figure()
        ax = fig.add_subplot(111)
        ax.imshow(draw.unnormalize_image(image_float))
        draw.plot_2d_hand(ax, j2d[draw.jointsMapSMPLXToSimple],
                          order="uv")
        fig.savefig(os.path.join(self.result_dir, f"{stem}_overlay.png"))
        plt.close(fig)


def main(argv=None):
    from scat_tpu.config import BaseOptions
    opt = BaseOptions().parse(argv)
    Tester(opt).test()


if __name__ == "__main__":
    main()
