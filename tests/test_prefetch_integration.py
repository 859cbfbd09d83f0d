"""Dataset + native-store prefetch integration, and the prefetch iterator."""

import numpy as np
import pytest

from cone_tpu.config import DataConfig
from cone_tpu.data.dataset import GroundingDataset, QueryExample
from cone_tpu.data.prefetch import prefetch_iterator
from cone_tpu.data.store import TextFeatureStore, InMemoryArrayStore, write_packed_store


def test_prefetch_iterator_order_and_errors():
    assert list(prefetch_iterator(iter(range(100)))) == list(range(100))

    def boom():
        yield 1
        raise ValueError("boom")

    it = prefetch_iterator(boom())
    assert next(it) == 1
    with pytest.raises(ValueError):
        list(it)


def test_dataset_prefetch_videos_native(tmp_path, rng):
    native = pytest.importorskip("cone_tpu.data.native_store")
    if not native.native_available():
        pytest.skip("native store unavailable")

    vids = {f"v{i}": rng.normal(size=(60, 16)).astype(np.float32) for i in range(4)}
    path = str(tmp_path / "v.cfs")
    write_packed_store(path, vids)
    store = native.NativePackedStore(path, prefetch_threads=2)

    toks = {f"v{i}_q": rng.normal(size=(4, 16)).astype(np.float32) for i in range(4)}
    clss = {f"v{i}_q": rng.normal(size=(1, 16)).astype(np.float32) for i in range(4)}
    examples = [
        QueryExample(query_id=f"v{i}_q", query="", video_id=f"v{i}",
                     clip_id=f"v{i}", timestamps=[5.0, 10.0], duration=60.0)
        for i in range(4)
    ]
    cfg = DataConfig(max_v_l=16, max_q_l=4, clip_length=1.0)
    ds = GroundingDataset(
        examples, store,
        TextFeatureStore(InMemoryArrayStore(toks), InMemoryArrayStore(clss)),
        cfg,
    )
    ds.prefetch_videos([e.clip_id for e in examples])  # must not raise
    for i in range(4):
        appear, motion = ds.video_features(f"v{i}")
        assert appear.shape == (60, 16)
        assert motion is appear
