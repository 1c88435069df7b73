"""MultiDataset: dataset zipping + training-stage mixes.

Reference dataset/MultiDataset.py: ``ConcatDataset.__getitem__`` returns
a *tuple of per-dataset samples* so the train loop iterates
``for data in datas`` over one batch from each dataset
(reference train.py:136-138); stage 1-6 picks the mix (only stage 3 /
STB is live in the shipped snapshot, the rest commented).  Here every
stage is wired to the corresponding loader; the loaders the reference
imports but does not ship (SURVEY.md "Missing modules") are re-derived:
freihand.py, ho3d.py, mhp.py, rhd.py.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

from scat_tpu.config import Options


class ConcatDataset:
    """Zip N batch-iterables; yields tuples of batches, truncated to the
    shortest (reference MultiDataset.py:4-12 min-length semantics).

    An EMPTY member is refused: min-length semantics would make the
    whole mix zero-length and the trainer would 'finish' untrained
    after zero steps per epoch with no error.
    """

    def __init__(self, *datasets):
        for d in datasets:
            if not len(d):
                raise ValueError(
                    f"ConcatDataset member {type(d).__name__} is empty "
                    "(no samples found on disk?) — the min-length zip "
                    "would silently produce zero training batches")
        self.datasets = datasets

    def __len__(self) -> int:
        return min(len(d) for d in self.datasets)

    def __iter__(self) -> Iterator[Tuple]:
        iters = [iter(d) for d in self.datasets]
        for _ in range(len(self)):
            yield tuple(next(it) for it in iters)


def concat_dataset(batch_size: int, opt: Options) -> ConcatDataset:
    """reference MultiDataset.py:14-78."""
    assert opt.stage in [1, 2, 3, 4, 5, 6], \
        "stage must fall in 1, 2, 3, 4, 5, 6"
    from scat_tpu.data.stb import get_loader_STB

    if opt.stage == 1:
        print("[STAGE][1] pretrain, use Freihand&ho3d dataset.")
        from scat_tpu.data.freihand import get_loader_frei
        from scat_tpu.data.ho3d import get_loader_ho3d
        return ConcatDataset(
            get_loader_frei("training", batch_size, opt),
            get_loader_ho3d("training", batch_size, opt))
    elif opt.stage == 2:
        print("[STAGE][2] finetune, use RHD, STB, freiHand, STB, MHP.")
        from scat_tpu.data.freihand import get_loader_frei
        from scat_tpu.data.ho3d import get_loader_ho3d
        from scat_tpu.data.mhp import get_loader_MHP
        # The reference's RHD/MHP loaders are missing upstream; MHP is
        # re-derived (scat_tpu/data/mhp.py) and joins the mix when its
        # tree is on disk (ConcatDataset truncates to the shortest
        # member, so an empty MHP dir must not join), RHD likewise
        # (scat_tpu/data/rhd.py).
        from scat_tpu.data.rhd import get_loader_RHD
        members = [
            get_loader_frei("training", batch_size, opt),
            get_loader_ho3d("training", batch_size, opt),
            get_loader_STB("training", batch_size, opt)]
        # MHP/RHD join the mix only when their trees are on disk
        # (ConcatDataset truncates to the SHORTEST member, so an empty
        # one would silently zero the whole stage).  A *partial* tree
        # (e.g. calibrations/ present but rvec.pkl missing) raises in
        # the loader ctor — treat that the same as absent, with a
        # warning, so an optional member can't fail the whole stage.
        for name, factory in (("MHP", get_loader_MHP),
                              ("RHD", get_loader_RHD)):
            try:
                extra = factory("training", batch_size, opt)
            except Exception as e:  # malformed optional tree
                print(f"[STAGE][2] {name} tree present but unreadable, "
                      f"skipping it: {e}")
                continue
            if len(extra):
                members.append(extra)
        return ConcatDataset(*members)
    elif opt.stage == 3:
        print("[STAGE][3] finish, finetune.")
        return ConcatDataset(get_loader_STB("training", batch_size, opt))
    elif opt.stage == 4:
        print("[STAGE][4] Ablation Study on freiHand.")
        from scat_tpu.data.freihand import get_loader_frei
        return ConcatDataset(
            get_loader_frei("training", batch_size, opt))
    elif opt.stage == 5:
        print("[STAGE][5] Ablation Study on Ho-3D.")
        from scat_tpu.data.ho3d import get_loader_ho3d
        return ConcatDataset(
            get_loader_ho3d("training", batch_size, opt))
    elif opt.stage == 6:
        print("[STAGE][6] Ablation Study on MHP.")
        from scat_tpu.data.mhp import get_loader_MHP
        # the reference's load_MHP.py is missing upstream; the loader is
        # re-derived from the surviving call sites (scat_tpu/data/mhp.py)
        mhp = get_loader_MHP("training", batch_size, opt)
        if not len(mhp):
            # fail loudly: a zero-length sole member would make the
            # trainer run zero steps per epoch and "finish" untrained
            raise FileNotFoundError(
                "[STAGE][6] no MHP data found (expected "
                "annotated_frames/ + calibrations/ under the MHP root "
                "next to --data_dir); see scat_tpu/data/mhp.py for the "
                "expected tree")
        return ConcatDataset(mhp)
