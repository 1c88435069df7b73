"""Video/temporal demo flow — reference ``Trainer.demo`` (eval.py:587-786).

Per frame (<= 200): fixed-window crop pinned to frame-0 reference joints
(crop_hand_ref eval.py:89-108) -> forward -> feature-map tile dump ->
16-frame sliding window acceleration / accel-error -> per-frame
PCK/AUC/MPJPE + 3-panel plot -> video export -> final MPJPE/ACC/AUC.

The reference demo loaders (MHP_eval / STB_VIBE_demo / ho3d_VIBE_demo)
are MISSING classes (SURVEY.md); their call-site contract is
``loader.seq_len()`` + ``loader.get_sample(i) -> (image, kp_2d, kp_3d)``
(eval.py:616,634).  :class:`SequenceLoader` adapts our STB eval split
(sequential frames) and any (images, j2d, j3d) arrays to that protocol.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scat_tpu.config import Options
from scat_tpu.data import preprocess
from scat_tpu.models import build_model, check_eval_variables
from scat_tpu.ops import metrics as metrics_lib
from scat_tpu.ops.geometry import batch_orth_proj_idrot, project_2d
from scat_tpu.utils import checkpoint as ckpt_lib
from scat_tpu.viz import draw

RNGE = np.arange(20, 51, 5)


class SequenceLoader:
    """Demo-loader protocol: seq_len() + get_sample(i)."""

    def __init__(self, images: np.ndarray, joints_2d: np.ndarray,
                 joints_3d: np.ndarray):
        self.images = images
        self.joints_2d = joints_2d
        self.joints_3d = joints_3d

    def seq_len(self) -> int:
        return len(self.images)

    def get_sample(self, i: int):
        return self.images[i], self.joints_2d[i], self.joints_3d[i]


def stb_vibe_demo(seq_name: str, opt: Options) -> SequenceLoader:
    """STB_VIBE_demo stand-in (missing class, imported eval.py:47):
    sequential frames of one STB sequence."""
    from scat_tpu.data import stb as stb_lib
    ds = stb_lib.STBDataset("STB_eval", data_dir=opt.data_dir,
                            batch_size=1, shuffle=False, opt=opt)
    keep = [i for i, p in enumerate(ds.image_paths) if seq_name in p]
    images, j2d, j3d = [], [], []
    for i in keep[:200]:
        a, b = ds.sample_labels(i)
        images.append(ds._load_image(ds.image_paths[i]))
        j3d.append(a)
        j2d.append(b)
    return SequenceLoader(np.stack(images), np.stack(j2d), np.stack(j3d))


class DemoRunner:
    """``DemoRunner(opt).demo(eval_set)`` (reference eval.py:587-786)."""

    def __init__(self, opt: Options, variables=None,
                 loader: Optional[SequenceLoader] = None,
                 image_size: int = 224):
        self.opt = opt
        self.image_size = image_size
        self.result_dir = opt.result_dir
        for sub in ("fm", "3d", "img"):
            os.makedirs(os.path.join(self.result_dir, sub), exist_ok=True)
        self.model, self.mean_params = build_model(opt, image_size)
        if variables is None:
            sample = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
            variables = self.model.init(
                {"params": jax.random.key(0), "mask": jax.random.key(1),
                 "dropout": jax.random.key(2)}, sample, train=False)
            variables = dict(variables)
            # ViP's frozen FAVOR+ projection is part of the saved
            # TrainState — running the demo with a re-drawn one would
            # silently use the wrong feature map (same merge as the
            # Evaluator, one checkpoint read)
            p_, bs_, c_ = ckpt_lib.restore_variables_nonstrict(
                opt.checkpoint_path_eval, variables["params"],
                variables.get("batch_stats", {}),
                constants=dict(variables.get("constants", {})))
            variables["params"] = p_
            variables["batch_stats"] = bs_
            variables["constants"] = c_
        check_eval_variables(opt, variables)
        self.variables = {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})}
        if variables.get("constants"):  # ViP's frozen FAVOR+ projection
            self.variables["constants"] = variables["constants"]
        self.loader = loader

        @jax.jit
        def forward(images):
            out = self.model.apply(self.variables, images, train=False)
            pred, fmap = out[0], out[1]
            cam = pred[:, :3]
            j3d = pred[:, 3:66].reshape(-1, 21, 3)
            j2d = project_2d(batch_orth_proj_idrot(j3d, cam))
            return pred, fmap, j3d, j2d

        self._forward = forward

    def demo(self, eval_set: Optional[str] = None):
        """Run the temporal demo over ``eval_set`` ('STB'/'MHP'/'ho3d');
        an injected ``loader`` takes precedence (it IS the sequence, a
        set name would be ignored — passing both is an error)."""
        opt = self.opt
        loader = self.loader
        if loader is not None and eval_set is not None:
            raise ValueError(
                "DemoRunner was constructed with an injected loader; "
                "demo(eval_set=...) would be ignored")
        if loader is None:
            eval_set = eval_set or opt.eval_dataset
            demo_seqs = {"MHP": "data_15_cam_1", "STB": "B1Counting",
                         "ho3d": "GPMF11"}
            if eval_set not in demo_seqs:
                # e.g. --eval_dataset frei is legal for the Evaluator but
                # has no video demo sequence (reference eval.py:601-614)
                raise ValueError(
                    f"no demo sequence for eval_set={eval_set!r}; "
                    f"choose one of {sorted(demo_seqs)} or inject a "
                    "loader")
            seq = demo_seqs[eval_set]
            if eval_set == "STB":
                loader = stb_vibe_demo(seq, opt)
            elif eval_set == "ho3d":
                loader = ho3d_vibe_demo(seq, opt)
            else:   # MHP_eval stand-in (reference eval.py:601-605)
                from scat_tpu.data.mhp import mhp_eval
                loader = mhp_eval(seq, opt)
        time_seq = min(loader.seq_len(), 200)
        mpjpe = np.zeros(time_seq)
        pck_all = np.zeros((len(RNGE), 22))
        accelerate_avg = 0.0
        acc_list, tar_list = [], []
        kp_2d_ref = None
        n = 0
        for i in range(time_seq):
            t0 = time.time()
            img, kp_2d, kp_3d = loader.get_sample(i)
            n += 1
            if kp_2d_ref is None:
                kp_2d_ref = kp_2d
            # fixed-window crop pinned to frame 0 (eval.py:636-641)
            M, kp_2d_c = preprocess.crop_hand_affine(
                jnp.asarray(kp_2d_ref, jnp.float32)[None],
                img.shape[1], img.shape[0], self.image_size,
                expand=1.5, min_size=20.0)
            ones = jnp.ones((1, 21, 1), jnp.float32)
            kp_2d_c = jnp.einsum(
                "bij,bnj->bni", M,
                jnp.concatenate([jnp.asarray(kp_2d, jnp.float32)[None],
                                 ones], -1))
            crop = preprocess.affine_sample(
                preprocess.normalize_to_unit(
                    jnp.asarray(img, jnp.float32)[None]),
                M, self.image_size, self.image_size, fill=-1.0)
            pred, fmap, j3d, j2d = self._forward(crop)
            # feature-map tiles (eval.py:651-665; inverted grayscale) —
            # only spatial [H,W,C] feature maps tile; vector-feature
            # heads (ViT/ViP emit [dim]) have nothing to render
            fm = np.asarray(fmap[0], np.float32)
            if fm.ndim == 3:
                tiles = 255 - draw.feature_map_tiles(
                    np.clip(fm * 127.5 + 127.5, 0, 255) / 255.0)
                import cv2
                cv2.imwrite(os.path.join(self.result_dir,
                                         f"fm/{n:03d}.png"), tiles)
            pred_3d = np.asarray(j3d)[0]
            pred_2d = np.asarray(j2d)[0]
            gt_3d = np.asarray(kp_3d, np.float32).reshape(21, 3)
            gt_2d = np.asarray(kp_2d_c)[0]
            # 16-frame sliding accel window (eval.py:679-695)
            if len(acc_list) == 16:
                acc_list.pop(0)
                tar_list.pop(0)
            acc_list.append(pred_3d)
            tar_list.append(gt_3d)
            if len(acc_list) == 16:
                accel = float(np.mean(np.asarray(metrics_lib.compute_accel(
                    jnp.asarray(np.stack(acc_list)))))) * 1000
                print("acceleration: " + str(accel))
                accelerate_avg += accel
                accel_err = float(np.mean(np.asarray(
                    metrics_lib.compute_error_accel(
                        jnp.asarray(np.stack(tar_list)),
                        jnp.asarray(np.stack(acc_list)))))) * 1000
                print("acceleration error (compare with gt): "
                      + str(accel_err))
            fps = 1.0 / (time.time() - t0)
            print(f"FPS: {fps:.2f}")
            pck = np.asarray(metrics_lib.cal_pck(
                jnp.asarray(pred_3d)[None], jnp.asarray(gt_3d)[None],
                tuple(int(r) for r in RNGE),
                flat_compat=opt.compat_pck_flat))
            pck_all += pck
            auc = float(metrics_lib.area_under_curve(
                jnp.asarray(RNGE / RNGE.max(), jnp.float32),
                jnp.asarray(pck[:, -1], jnp.float32)))
            print("AUC: {}.".format(auc))
            print("@50: {}.".format(pck[-1, -1]))
            # 3-panel plot + raw crop (eval.py:709-742)
            self._plot_frame(crop, gt_3d, pred_3d, pred_2d, n)
            err = np.sqrt(((pred_3d - gt_3d) ** 2).sum(-1)).mean()
            mpjpe[i] = err
        draw.generate_video(os.path.join(self.result_dir, "3d"),
                            self.result_dir)
        pck_all /= max(n, 1)
        auc = float(metrics_lib.area_under_curve(
            jnp.asarray(RNGE / RNGE.max(), jnp.float32),
            jnp.asarray(pck_all[:, -1], jnp.float32)))
        from scat_tpu.evaluation.evaluator import save_pck_curve
        save_pck_curve(RNGE, pck_all[:, -1],
                       os.path.join(self.result_dir, "PCK.png"))
        print("*** Final Results ***")
        print()
        print("MPJPE: " + str(1000 * mpjpe.mean()))
        print("ACC:" + str(accelerate_avg / time_seq))
        print("AUC: " + str(auc))
        return {"mpjpe_mm": 1000 * mpjpe.mean(),
                "acc": accelerate_avg / time_seq, "auc": auc}

    def _plot_frame(self, crop, gt_3d, pred_3d, pred_2d, n):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception as e:  # pragma: no cover
            print(f"matplotlib unavailable, skipping frame plot: {e}")
            return
        import cv2
        remap = draw.jointsMapSMPLXToSimple
        fig = plt.figure()
        fig.set_size_inches(1500 / fig.dpi, 500 / fig.dpi, forward=True)
        ax1 = fig.add_subplot(131, projection="3d")
        ax2 = fig.add_subplot(132, projection="3d")
        ax3 = fig.add_subplot(133)
        image_save = draw.unnormalize_image(np.asarray(crop[0]))
        ax3.imshow(image_save)
        draw.plot_3d_hand(ax1, gt_3d[remap])
        ax1.set_xlabel("ground truth 3d joints", fontsize=10)
        draw.plot_3d_hand(ax2, pred_3d[remap])
        ax2.set_xlabel("predict 3d joints", fontsize=10)
        draw.plot_2d_hand(ax3, pred_2d[remap], order="uv")
        fig.savefig(os.path.join(self.result_dir, f"3d/gt_pred_{n:03d}.png"))
        cv2.imwrite(os.path.join(self.result_dir, f"img/{n:03d}.png"),
                    image_save[:, :, ::-1])
        plt.close()


def ho3d_vibe_demo(seq_name: str, opt: Options) -> SequenceLoader:
    """ho3d_VIBE_demo stand-in (missing class, imported eval.py:48):
    sequential frames of one HO-3D sequence."""
    from scat_tpu.data import ho3d as ho3d_lib
    import os as _os
    data_dir = _os.path.join(
        _os.path.dirname(opt.data_dir.rstrip("/")), "HO3D")
    if not _os.path.isdir(data_dir):
        data_dir = opt.data_dir
    ds = ho3d_lib.HO3DDataset(data_dir, "train", batch_size=1,
                              shuffle=False, seed=opt.seed)
    keep = [(r, m) for (r, m) in ds.samples if seq_name in r][:200]
    images, j2d, j3d = [], [], []
    for rgb_path, meta_path in keep:
        label, kp2 = ds.sample_labels(meta_path)
        images.append(ds._load_image(rgb_path))
        j3d.append(label[61:124].reshape(21, 3))
        j2d.append(kp2)
    return SequenceLoader(np.stack(images), np.stack(j2d).astype(np.float32),
                          np.stack(j3d).astype(np.float32))


def main(argv=None):
    """CLI for the temporal demo — the flow the reference's shipped
    ``__main__`` actually runs (eval.py:1073-1076 calls demo(); main()
    and test() are commented out there)."""
    from scat_tpu.config import BaseOptions
    opt = BaseOptions().parse(argv)
    runner = DemoRunner(opt)
    name = opt.eval_dataset.lower()
    if name == "stb":
        runner.loader = stb_vibe_demo("B1Counting", opt)
    elif name == "mhp":   # reference eval.py:601-605
        from scat_tpu.data.mhp import mhp_eval
        runner.loader = mhp_eval("data_15_cam_1", opt)
    else:
        runner.loader = ho3d_vibe_demo("GPMF11", opt)  # eval.py:613
    runner.demo()


if __name__ == "__main__":
    main()
