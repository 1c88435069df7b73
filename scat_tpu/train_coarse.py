"""CLI entry: ``python -m scat_tpu.train_coarse``
(reference train_coarse.py:248-253 — identical to train.py except the
net switch defaults to the attention-returning coarse head,
train_coarse.py:47-58)."""

from scat_tpu.config import BaseOptions
from scat_tpu.training.trainer import Trainer


def main(argv=None):
    opt = BaseOptions().parse(argv)
    if opt.net == "ViT":  # reference default routes to the coarse head
        opt.net = "reg_transformer_coarse"
    Trainer(opt).train()


if __name__ == "__main__":
    main()
