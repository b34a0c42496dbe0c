"""Input-pipeline prefetching: ordering, exceptions, determinism.

The loader is the reference ``DataLoader(num_workers=4, pin_memory=True)``
analogue (``run_rpn.py:332-339``): threaded sample loading inside
``batch_iterator`` plus a background assembly/transfer thread
(``prefetch_iterator``).  The key contract tested here is that threading
NEVER changes the produced batches: augmentation draws come from
per-(item, access) rng streams, not a shared generator.
"""

import time

import numpy as np
import pytest

from nerf_rpn_tpu.data.datasets import HypersimRPNDataset, batch_iterator
from nerf_rpn_tpu.data.loader import prefetch_iterator

from test_data_eval import make_scene_files


def test_prefetch_order_and_transform():
    out = list(prefetch_iterator(iter(range(20)), depth=3,
                                 transform=lambda x: x * 2))
    assert out == [x * 2 for x in range(20)]


def test_prefetch_depth_zero_is_synchronous():
    out = list(prefetch_iterator(iter(range(5)), depth=0,
                                 transform=lambda x: x + 1))
    assert out == [1, 2, 3, 4, 5]


def test_prefetch_exception_propagates():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch_iterator(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_transform_exception_propagates():
    def bad(x):
        if x == 3:
            raise RuntimeError("transform died")
        return x

    it = prefetch_iterator(iter(range(10)), depth=2, transform=bad)
    with pytest.raises(RuntimeError, match="transform died"):
        list(it)


def test_prefetch_early_close_does_not_hang():
    def infinite():
        i = 0
        while True:
            yield i
            i += 1

    it = prefetch_iterator(infinite(), depth=2)
    assert next(it) == 0
    t0 = time.perf_counter()
    it.close()  # must signal the worker, not block on a full queue
    assert time.perf_counter() - t0 < 5.0


def _aug_dataset(tmp_path):
    for i in range(5):
        make_scene_files(tmp_path, f"s{i}", shape=(10 + i, 8, 6))
    return HypersimRPNDataset(
        str(tmp_path), str(tmp_path), preload=True,
        flip_prob=0.5, rotate_prob=0.5, rot_scale_prob=0.5)


def test_threaded_loading_matches_serial(tmp_path):
    """num_workers > 0 and prefetch depth must not change a single byte of
    any batch, including augmentation draws (two epochs: the per-access rng
    advances identically)."""
    kw = dict(pad_multiple=8, max_gt=5, shuffle=True)

    def epochs(num_workers, depth):
        ds = _aug_dataset(tmp_path)  # fresh rng state
        out = []
        for epoch in range(2):
            it = batch_iterator(ds, 2, seed=epoch, num_workers=num_workers,
                                **kw)
            out.extend(prefetch_iterator(it, depth=depth))
        return out

    serial = epochs(0, 0)
    threaded = epochs(4, 2)
    assert len(serial) == len(threaded)
    for a, b in zip(serial, threaded):
        assert a["names"] == b["names"]
        for k in ("grids", "ori_sizes", "gt_boxes", "gt_mask"):
            np.testing.assert_array_equal(a[k], b[k])


def test_item_rng_streams_reproducible(tmp_path):
    """The k-th access of item i augments identically across dataset
    instances, and consecutive accesses of the same item differ (the
    stream advances per access, as one shared rng would)."""
    ds1 = _aug_dataset(tmp_path)
    ds2 = _aug_dataset(tmp_path)
    a1 = [ds1[0][0] for _ in range(3)]
    a2 = [ds2[0][0] for _ in range(3)]
    for x, y in zip(a1, a2):
        np.testing.assert_array_equal(x, y)
    assert any(
        a1[0].shape != a1[k].shape or not np.array_equal(a1[0], a1[k])
        for k in (1, 2))
