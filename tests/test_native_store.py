"""Native C++ .cfs reader vs the Python mmap reader."""

import numpy as np
import pytest

from cone_tpu.data.store import PackedArrayStore, write_packed_store

native = pytest.importorskip("cone_tpu.data.native_store")

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native store unavailable"
)


@pytest.fixture(scope="module")
def store_path(tmp_path_factory):
    rng = np.random.default_rng(0)
    items = {
        f"vid_{i}": rng.normal(size=(int(rng.integers(3, 80)), 24)).astype(np.float32)
        for i in range(23)
    }
    path = str(tmp_path_factory.mktemp("cfs") / "feat.cfs")
    write_packed_store(path, items)
    return path, items


def test_native_matches_python(store_path):
    path, items = store_path
    ns = native.NativePackedStore(path)
    ps = PackedArrayStore(path)
    assert set(ns.keys()) == set(items)
    for k, v in items.items():
        np.testing.assert_array_equal(ns.get(k), v)
        np.testing.assert_array_equal(ns.get(k), ps.get(k))
    assert "vid_0" in ns and "missing" not in ns


def test_native_read_batch(store_path):
    path, items = store_path
    ns = native.NativePackedStore(path)
    keys = ["vid_3", "vid_7", "missing", "vid_0"]
    out, lengths = ns.read_batch(keys, max_rows=50)
    assert out.shape == (4, 50, 24)
    for i, k in enumerate(keys):
        if k == "missing":
            assert lengths[i] == 0
            np.testing.assert_array_equal(out[i], 0)
            continue
        n = min(len(items[k]), 50)
        assert lengths[i] == n
        np.testing.assert_array_equal(out[i, :n], items[k][:n])
        np.testing.assert_array_equal(out[i, n:], 0)


def test_native_prefetch_is_safe(store_path):
    path, items = store_path
    ns = native.NativePackedStore(path, prefetch_threads=2)
    ns.prefetch(list(items))
    # results identical while prefetch churns in the background
    for k, v in list(items.items())[:5]:
        np.testing.assert_array_equal(ns.get(k), v)
