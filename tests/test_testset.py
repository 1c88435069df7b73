"""TestDataset — folder-of-images inference set.

Contract from reference dataset/load_test_dataset.py:169-202: sorted
directory listing, RGB convert, 224x224 BILINEAR resize, [-1,1]
normalization, items are ``(image, w, h, filename)``.
"""

import numpy as np
import pytest
from PIL import Image

from scat_tpu.data.testset import TestDataset, get_loader_test


@pytest.fixture
def image_tree(tmp_path):
    rng = np.random.RandomState(0)
    sizes = {"b_frame.png": (320, 240), "a_frame.png": (64, 128)}
    for name, (w, h) in sizes.items():
        arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / name)
    return tmp_path, sizes


def test_items_match_reference_contract(image_tree):
    tree, sizes = image_tree
    ds = get_loader_test(str(tree))
    assert len(ds) == 2
    # sorted listing: a_frame before b_frame (reference sorts os.listdir)
    names = [item[3] for item in ds]
    assert names == ["a_frame.png", "b_frame.png"]
    for img, w, h, name in ds:
        assert (w, h) == sizes[name]
        assert img.shape == (224, 224, 3)
        arr = np.asarray(img)
        assert arr.min() >= -1.0 and arr.max() <= 1.0
        assert arr.std() > 0.1  # random content survived the transform


def test_pixel_values_reexec(image_tree):
    """Float64 re-execution of the reference transform chain
    (Resize(BILINEAR) -> ToTensor -> Normalize(.5,.5)) on one image."""
    tree, _ = image_tree
    ds = TestDataset(str(tree))
    img, w, h, name = ds[0]
    ref = Image.open(tree / name).convert("RGB")
    expected = np.asarray(
        ref.resize((224, 224), Image.BILINEAR)).astype(np.float64)
    expected = (expected / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(np.asarray(img, np.float64), expected,
                               atol=1e-6)
