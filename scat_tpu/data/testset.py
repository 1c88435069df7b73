"""Folder-of-images inference dataset + temporal windowing utilities.

Reference dataset/load_test_dataset.py:169-202 (``TestDataset`` yields
``(image, w, h, filename)``), and dataset/utils.py:6-178
(``view_as_windows`` strided rolling window / ``split_into_chunks``
video -> (start, end) chunking used by the temporal stage and the
16-frame acceleration window, reference eval.py:679-686).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from scat_tpu.config import Options
from scat_tpu.data.preprocess import normalize_to_unit


class TestDataset:
    """reference load_test_dataset.py:169-197: resize to 224, normalize,
    yield (image, w, h, filename)."""

    def __init__(self, test_dir: str = "experiments/0218",
                 opt: Optional[Options] = None):
        self.base_path = test_dir
        self.test_list = sorted(os.listdir(test_dir))

    def __len__(self) -> int:
        return len(self.test_list)

    def __getitem__(self, index: int):
        from PIL import Image
        seq = self.test_list[index]
        img = Image.open(os.path.join(self.base_path, seq)).convert("RGB")
        w, h = img.size
        # torchvision Resize defaults to BILINEAR; PIL's own default is
        # BICUBIC, so pin the filter (same note in freihand._load_image)
        arr = np.asarray(img.resize((224, 224), Image.BILINEAR))
        return (normalize_to_unit(jnp.asarray(arr)), w, h, seq)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def get_loader_test(test_dir: str, opt: Optional[Options] = None
                    ) -> TestDataset:
    """reference load_test_dataset.py:199-202."""
    return TestDataset(test_dir, opt)


def view_as_windows(arr: np.ndarray, window_shape, step=1) -> np.ndarray:
    """Strided rolling window (the skimage routine the reference vendors,
    dataset/utils.py:6-156)."""
    if isinstance(window_shape, int):
        window_shape = (window_shape,)
    if isinstance(step, int):
        step = (step,) * arr.ndim
    window_shape = tuple(window_shape) + (1,) * (arr.ndim
                                                 - len(window_shape))
    win_indices_shape = tuple(
        (np.array(arr.shape) - np.array(window_shape))
        // np.array(step) + 1)
    new_shape = win_indices_shape + tuple(window_shape)
    strides = tuple(np.array(arr.strides) * np.array(step)) + arr.strides
    return np.lib.stride_tricks.as_strided(arr, shape=new_shape,
                                           strides=strides)


def split_into_chunks(vid_names: np.ndarray, seqlen: int, stride: int
                      ) -> List[List[int]]:
    """Video frames -> (start, end) window indices
    (reference dataset/utils.py:158-178)."""
    video_start_end_indices: List[List[int]] = []
    video_names, group = np.unique(vid_names, return_index=True)
    perm = np.argsort(group)
    video_names, group = video_names[perm], group[perm]
    indices = np.split(np.arange(0, vid_names.shape[0]), group[1:])
    for idx in range(len(video_names)):
        indexes = indices[idx]
        if indexes.shape[0] < seqlen:
            continue
        chunks = view_as_windows(indexes, (seqlen,), step=stride)
        start_finish = chunks[:, (0, -1)].tolist()
        video_start_end_indices += start_finish
    return video_start_end_indices
