"""Export the serving forward to a StableHLO artifact, then serve it.

Stage 1 (a machine with the framework + checkpoint):

    python -m scat_tpu.export --net reg_transformer \
        --checkpoint_path_eval experiments/.../hand_net_final \
        --export_dir /srv/scat_artifact

Stage 2 (the serving host — needs only jax + numpy + scat_tpu's
``export``/``serving`` modules; no model code, no checkpoint):

    python examples/serve_artifact.py /srv/scat_artifact

This script does both stages in one process against a fresh-init
predictor so it runs anywhere (no checkpoint on disk needed).
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    from scat_tpu.export import export_predictor, load_artifact

    if len(sys.argv) > 1:
        artifact = sys.argv[1]
    else:
        from scat_tpu.config import Options
        from scat_tpu.serving import HandPosePredictor
        opt = Options(net="reg_transformer", iteration=3, vit_heads=8,
                      checkpoint_path_eval="/nonexistent")
        predictor = HandPosePredictor.from_checkpoint(opt)
        artifact = tempfile.mkdtemp(prefix="scat_artifact_")
        export_predictor(predictor, artifact)
        print(f"exported fresh-init flagship -> {artifact}")

    served = load_artifact(artifact)
    crops = np.random.default_rng(0).integers(
        0, 256, (5, served.image_size, served.image_size, 3), np.uint8)
    out = served.predict(crops)
    print("camera:", out["camera"].shape,
          "joints_3d:", out["joints_3d"].shape,
          "joints_2d:", out["joints_2d"].shape)
    print("sample camera row:", np.round(out["camera"][0], 4))


if __name__ == "__main__":
    main()
